"""Table maintenance: small-file compaction.

Streaming sinks (foreachBatch appends, micro-batch parquet) and
over-parallel writes accumulate files far smaller than a scan's ideal
split (~128 MB): at 100 TB that's metadata pressure on the file listing,
a task per tiny file, and scan throughput collapse. The reference's
answer was ``coalesce(1)`` at write time (glue/data_ingestion_s3.py:33) —
which serializes the WRITE to one task. Compaction instead runs after the
fact: size the output file count from the actual on-disk bytes, rewrite
in parallel, atomically swap.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    sort_col: str | None = None,
) -> int:
    """Rewrite ``path`` into ceil(bytes/target) parquet files; returns the
    new file count.

    ``sort_col`` additionally range-clusters during the rewrite (see
    ``gold.write_sorted``) so compaction doubles as layout optimization.
    The rewrite lands in a sibling temp dir and swaps in via
    ``renameat2(RENAME_EXCHANGE)`` — a single atomic syscall on Linux, so
    readers see either the old or the new table, never neither. Where the
    exchange isn't available the fallback is rename-aside → rename-in →
    delete-aside: the old data survives until the new path is live (a
    reader can hit ENOENT in the instant between the two renames, but a
    crash never loses the table, unlike delete-then-rename). On object
    stores a transactional table format would do this under a log instead.
    """
    n_files = max(1, math.ceil(_dir_bytes(path) / target_file_bytes))
    df: DataFrame = spark.read.parquet(path)
    out = (
        df.repartitionByRange(n_files, sort_col).sortWithinPartitions(sort_col)
        if sort_col
        else df.repartition(n_files)
    )
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    if _exchange_dirs(path, tmp):
        shutil.rmtree(tmp)  # tmp now holds the pre-compaction files
    else:
        aside = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
        os.rename(path, aside)
        os.rename(tmp, path)
        shutil.rmtree(aside)
    return n_files


def _exchange_dirs(a: str, b: str) -> bool:
    """Atomically swap two directories via Linux ``renameat2`` with
    ``RENAME_EXCHANGE``; returns False where the syscall/flag is
    unavailable (non-Linux, old kernels, some filesystems)."""
    try:
        import ctypes
        import ctypes.util

        libc = ctypes.CDLL(ctypes.util.find_library("c"), use_errno=True)
        at_fdcwd = ctypes.c_int(-100)
        rename_exchange = ctypes.c_uint(2)
        ret = libc.renameat2(
            at_fdcwd, os.fsencode(a), at_fdcwd, os.fsencode(b), rename_exchange
        )
        return ret == 0
    except Exception:
        return False
