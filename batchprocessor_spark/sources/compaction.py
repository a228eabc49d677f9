"""Small-file compaction — the operational companion to any
file-streaming pipeline: spool/flush sinks produce many small parquet
files; readers at scale want few large ones (every file costs an open
+ footer parse + task).

``compact`` rewrites a parquet directory into ``target_files`` files
atomically (write to a sibling temp dir, then swap), preserving the
data exactly.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def compact(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    target_mb_per_file: float | None = None,
) -> int:
    """Rewrite the parquet table at ``path`` into fewer files.
    With ``target_mb_per_file`` the file count is derived from the
    current on-disk size. Returns the resulting file count."""
    if target_mb_per_file is not None:
        total_mb = sum(
            os.path.getsize(os.path.join(dp, f)) / 1e6
            for dp, _dn, fns in os.walk(path)
            for f in fns
            if f.endswith(".parquet")
        )
        target_files = max(1, round(total_mb / target_mb_per_file))
    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    # coalesce (no shuffle) is enough: we only ever merge downward.
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
