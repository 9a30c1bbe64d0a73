"""Scale-adaptive parallelism floor for compute-heavy stages.

Spark sizes scan partitions by BYTES (``spark.sql.files.maxPartitionBytes``)
and AQE coalesces shuffle partitions by bytes too — the right call for
I/O-bound relational work, but wrong for stages whose per-row cost dwarfs
their byte size (image decode, pHash DCTs, audio fingerprints: ~1 ms/row
of Python against ~100 B/row of input). A small parquet file lands in ONE
scan partition and the whole decode stage serializes on one core while
the rest of the cluster idles.

``spread_for_compute`` floors such a stage's parallelism at the session's
default parallelism. It is a NO-OP whenever the input already has enough
partitions — at production scale a corpus scan has thousands, so the
extra exchange exists only where the data was too small to parallelize
naturally (exactly when it is cheapest). Hash-partitioning on the given
key keeps the placement deterministic under task retry (guide §2.5:
round-robin repartition pays a defensive sort; a key hash does not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_for_compute(df: DataFrame, key: str) -> DataFrame:
    """Repartition ``df`` to the session default parallelism by hashing
    ``key`` — only when it currently has fewer partitions. Results are
    unaffected: callers apply per-row kernels and order-independent
    aggregates downstream."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col(key))
