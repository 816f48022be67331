from .parquet_source import TABLE_NAMES, load_table, load_tables, register_views
from .json_source import read_sanitized_json, unwrap_envelope, sanitize_json_text
from .csv_source import read_csv_sniffed
from .files import latest_file
from .jdbc_source import read_jdbc_query

__all__ = [
    "TABLE_NAMES", "load_table", "load_tables", "register_views",
    "read_sanitized_json", "unwrap_envelope", "sanitize_json_text",
    "read_csv_sniffed", "latest_file", "read_jdbc_query",
]
