"""Sinks. The reference's only sink is a value-per-line text file per
reduce task (F9, worker.go:301-320; oracle format "key value",
mrsequential.go:84). Spark supersedes it; helpers here pin the useful
shapes:

- ``write_parquet``: the default engine sink — partitioned columnar
  output; at 100 TB always partition by a pruning-friendly column
  (date, source) and let each task write its own file (no coalesce).
- ``write_text_kv``: the reference-compatible "key value" text sink for
  compat-API jobs; ``single_file=True`` gives the sequential oracle's
  one-file layout via coalesce(1) — correct, but serializes the write,
  so it's for small compat outputs only (the reference has the same
  bottleneck: NReduce output files, play.sh concatenates them).
- ``write_csv`` / ``write_json``: interchange sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str,
                  partition_by: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(df: DataFrame, path: str,
              partition_by: list[str] | None = None,
              mode: str = "overwrite") -> None:
    """ORC interchange sink (Hive/Trino ecosystems): same partitioned
    columnar contract as ``write_parquet`` — predicate pushdown, column
    pruning, and per-task files all carry over."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_text_kv(df: DataFrame, path: str, key: str = "key",
                  value: str = "value", single_file: bool = False,
                  mode: str = "overwrite") -> None:
    """Reference-format text sink: one '"key value"' line per row, sorted
    by key when single_file (the mrsequential.go:62-84 layout)."""
    out = df.select(
        F.concat_ws(" ", F.col(key).cast("string"),
                    F.col(value).cast("string")).alias("value"))
    if single_file:
        out = out.orderBy(F.col("value")).coalesce(1)
    out.write.mode(mode).text(path)


def compact_parquet(spark, path: str, target_mb: int = 128) -> tuple[int, int]:
    """Small-file compaction — the lake-maintenance operation every
    streaming/incremental writer eventually needs (each micro-batch
    commit leaves one file per task; thousands of KB-files make the
    NEXT reader's listing and scan planning the bottleneck). Rewrites
    ``path`` in place to ``ceil(bytes / target_mb)`` files via a
    round-robin repartition (no shuffle key — pure size balancing).

    Returns (files_before, files_after). In-place rewrite goes through
    a sibling temp dir + atomic-ish rename swap, so a crash mid-compact
    leaves either the old or the new layout, never a mix."""
    import math
    import os
    import shutil

    local = path[len("file://"):] if path.startswith("file://") else path
    files = [os.path.join(dp, f)
             for dp, _dn, fn in os.walk(local)
             for f in fn if f.endswith(".parquet")]
    n_before = len(files)
    total = sum(os.path.getsize(f) for f in files)
    n_after = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = local.rstrip("/") + "__compact_tmp"
    df.repartition(n_after).write.mode("overwrite").parquet(
        "file://" + tmp)
    old = local.rstrip("/") + "__compact_old"
    os.rename(local, old)
    os.rename(tmp, local)
    shutil.rmtree(old, ignore_errors=True)
    return n_before, n_after
