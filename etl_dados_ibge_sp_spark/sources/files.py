"""Landing-zone file discovery (SURVEY §2.1 S7).

The reference globs ``*.json`` and picks the newest by ctime
(dags/etl_municipios.py:64-69).  Driver-side glob is fine for a landing
directory; for data-scale selection Spark >=3.4 exposes file metadata
columns (``_metadata.file_modification_time``) so the same policy can
run distributed without listing on the driver.
"""

from __future__ import annotations

import glob
import os


def latest_file(directory: str, pattern: str = "*.json") -> str | None:
    """Newest matching file by modification time, or None."""
    files = glob.glob(os.path.join(directory, pattern))
    if not files:
        return None
    return max(files, key=os.path.getmtime)


def prune_old_files(directory: str, pattern: str = "*.csv",
                    keep: int = 5) -> list[str]:
    """K5 — keep only the ``keep`` newest matching files, delete the
    rest (the reference's MAX_HISTORICO retention,
    pipeline_manual.py:16-28).  Returns the deleted paths.  The
    row-level generalization is operators/topk.top_k_per_group."""
    files = sorted(glob.glob(os.path.join(directory, pattern)),
                   key=os.path.getmtime, reverse=True)
    doomed = files[keep:]
    for path in doomed:
        os.remove(path)
    return doomed
