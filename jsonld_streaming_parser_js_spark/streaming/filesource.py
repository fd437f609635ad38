"""Ordered-micro-batch file-source helper shared by the bounded
streaming oracle lanes (streaming_sessionize, streaming_quad_rates).

The file source with ``maxFilesPerTrigger=1`` feeds files in MTIME
order, so writing each slice as exactly one parquet file with strictly
increasing mtimes turns a bounded DataFrame into a deterministic
sequence of micro-batches — state/watermarks genuinely straddle batch
boundaries, and a final sentinel slice can flush them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_ordered_slices(slices: list[DataFrame], work_dir: str,
                         in_dir: str) -> None:
    """Write each DataFrame in ``slices`` as ONE parquet file inside
    ``in_dir``, mtimes increasing in list order (the last entry is
    typically the sentinel)."""
    os.makedirs(in_dir, exist_ok=True)
    mtime = 1_000_000_000
    for i, df in enumerate(slices):
        tmp = os.path.join(work_dir, f"slice_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(in_dir, f"{i:03d}.parquet")
        os.replace(os.path.join(tmp, src), dst)
        os.utime(dst, (mtime + i, mtime + i))
