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


def compact_parquet(spark, src_dir: str, dst_dir: str,
                    target_bytes: int = 128 << 20) -> int:
    """Small-files compaction: rewrite a fragmented parquet directory
    into ~``target_bytes`` files.  Returns the output file count.

    The small-files problem is the classic lake failure mode —
    streaming/incremental writers leave thousands of KB-sized files
    whose per-file open/footer overhead dominates scan time and whose
    listing crushes the driver.  Compaction sizes the output from the
    actual on-disk bytes and uses ``coalesce`` (narrow — merges
    partitions WITHOUT a shuffle; compaction only ever reduces file
    count, so the no-split limitation of coalesce is irrelevant and a
    full repartition shuffle would be pure waste).

    Driver-side ``os.walk`` sizing is the local-FS stand-in for the
    Hadoop FileSystem listing a cluster deployment would use; both are
    metadata-only.

    Returns the ACTUAL output file count (counted after the write):
    ``coalesce`` can only reduce partitions, so when the scan packs the
    input into fewer partitions than the byte-derived target (e.g.
    ``maxPartitionBytes`` >> target_bytes) the output has fewer, larger
    files than asked — the return value reports what happened, not
    what was requested."""
    import math

    total = 0
    for root, _dirs, names in os.walk(src_dir):
        for n in names:
            if n.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, n))
    n_files = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src_dir).coalesce(n_files) \
        .write.mode("overwrite").parquet(dst_dir)
    return sum(1 for _r, _d, names in os.walk(dst_dir)
               for n in names if n.endswith(".parquet"))
