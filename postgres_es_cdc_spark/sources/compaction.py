"""Small-file compaction — the table-maintenance chore every streaming
sink at scale needs: micro-batch sinks (UpsertSink, Scd2Sink, AggSink)
and partitioned writers accrete files far smaller than an efficient
scan unit; readers then pay per-file open/footer costs and tiny row
groups defeat parquet's columnar encodings.

[EXT] operational utility (the reference has no storage layer at all —
it delegates persistence to Elasticsearch). With a real table format
this is OPTIMIZE/rewrite_data_files; over plain parquet directories the
same effect is a size-targeted coalesce rewrite.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # one healthy scan unit


def plan_compaction(path: str,
                    target_bytes: int = DEFAULT_TARGET_BYTES) -> dict:
    """Inspect a parquet directory: file count, total bytes, and the
    output file count a compaction should produce."""
    files = [os.path.join(path, f) for f in os.listdir(path)
             if f.endswith(".parquet")]
    total = sum(os.path.getsize(f) for f in files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "target_files": max(1, math.ceil(total / target_bytes)),
    }


def compact_parquet_dir(spark: SparkSession, path: str,
                        target_bytes: int = DEFAULT_TARGET_BYTES) -> dict:
    """Rewrite a parquet directory into size-targeted files.

    coalesce (not repartition): compaction must not shuffle — it only
    narrows the file count, preserving existing data order within
    partitions. The rewrite goes through a temp dir then atomically
    replaces the original (same stage-then-swap pattern as the sinks).
    Returns the before/after plan for observability.
    """
    plan = plan_compaction(path, target_bytes)
    if plan["n_files"] <= plan["target_files"]:
        plan["compacted"] = False
        return plan
    df = spark.read.parquet(path)
    tmp = path + ".compact.tmp"
    df.coalesce(plan["target_files"]).write.mode("overwrite").parquet(tmp)
    # swap: re-point the directory at the compacted copy
    bak = path + ".compact.old"
    os.rename(path, bak)
    os.rename(tmp, path)
    import shutil
    shutil.rmtree(bak)
    plan["compacted"] = True
    return plan
