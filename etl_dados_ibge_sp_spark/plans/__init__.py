from .caged_pipeline import (
    RENAME_MAP, LOAD_ALLOWLIST, caged_transform, incremental_enrichment,
)

__all__ = [
    "RENAME_MAP", "LOAD_ALLOWLIST", "caged_transform",
    "incremental_enrichment",
]
