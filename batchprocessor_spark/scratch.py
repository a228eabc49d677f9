"""Process-scoped scratch directories.

Several source/layout queries intentionally return LAZY DataFrames
over a scratch copy they just wrote (the plan gates inspect pruning /
bucketing / pushdown on the live plan, so the builder cannot collect
and delete). Bare ``tempfile.mkdtemp`` made those copies immortal —
hundreds of ``/tmp/bp_*`` dirs accumulated across parity runs (review
r5). :func:`scratch_dir` keeps the within-process lifetime those
queries need but registers the directory for removal at interpreter
exit, so scratch never outlives the Spark session's process.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile


def scratch_dir(prefix: str) -> str:
    """``mkdtemp`` whose directory is removed at process exit."""
    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path
