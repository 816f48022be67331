from .project import (
    drop_if_present, rename_first_match, rename_map, allowlist_select,
    with_literal_time_columns,
)
from .repair import (
    try_cast_columns, fill_nulls, pin_key_types, normalize_string_key,
    sanitize_numeric_tokens,
)
from .joins import (
    enrich_left_join, anti_join_dedup, semi_join, resolve_dim_columns,
)
from .aggregate import distinct_keys, dsum, davg, rollup_agg, cube_agg
from .topk import top_k_per_group, top_k_global

__all__ = [
    "drop_if_present", "rename_first_match", "rename_map",
    "allowlist_select", "with_literal_time_columns",
    "try_cast_columns", "fill_nulls", "pin_key_types",
    "normalize_string_key", "sanitize_numeric_tokens",
    "enrich_left_join", "anti_join_dedup", "semi_join",
    "resolve_dim_columns",
    "distinct_keys", "dsum", "davg", "rollup_agg", "cube_agg",
    "top_k_per_group", "top_k_global",
]
