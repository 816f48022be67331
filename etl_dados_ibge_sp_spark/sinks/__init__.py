from .csv_sink import write_csv
from .parquet_sink import write_parquet_partitioned, restate_partition
from .jdbc_sink import write_jdbc_append, write_jdbc_overwrite, delete_and_insert, ensure_table_ddl

__all__ = [
    "write_csv", "write_parquet_partitioned", "restate_partition",
    "write_jdbc_append", "write_jdbc_overwrite", "delete_and_insert",
    "ensure_table_ddl",
]
