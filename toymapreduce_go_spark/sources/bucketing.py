"""Bucketed tables — co-located joins and aggregations without a shuffle.

The reference's only physical layout control is the nReduce hash
partitioning of intermediate files (coordinator.go:124-133); every run
re-shuffles everything. Spark's bucketing is the durable version of that
idea: ``bucketBy(n, key)`` hash-partitions *persisted* data once, at
write time, and every later join or aggregation on the bucket key reads
the buckets back co-located — Catalyst drops the Exchange entirely
(asserted in tests/test_bucketing.py).

At 100 TB this is the single biggest repeated-query win on the
fact-to-fact join surface (SCALE.md: lineitem⋈orders on orderkey):
an every-query multi-TB shuffle becomes a scan-local sort-merge join.
Rules that matter at that scale:

- Bucket BOTH sides on the SAME key with the SAME bucket count (a
  mismatch re-introduces the Exchange on one side).
- ``sortBy`` the bucket key too: bucket files arrive pre-sorted, so the
  sort-merge join's per-task Sort is a no-op over sorted runs.
- Size ``n_buckets`` so one bucket ≈ one task's memory budget (128-256
  MB post-compression); at sf100k that's tens of thousands of buckets —
  bucket count is a layout constant, so pick for the target scale, not
  the test corpus.
- Bucket pruning: equality predicates on the bucket key scan 1/n of the
  files (``spark.sql.sources.bucketing.enabled``, on by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str | list[str],
                   n_buckets: int, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed parquet
    table. Bucketed writes must go through the table catalog — a bare
    ``.parquet(path)`` write silently drops bucket metadata."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two tables bucketed on ``on`` with equal bucket counts; the
    physical plan is a sort-merge join with NO Exchange on either side
    (both inputs' bucketing already satisfies the join's required
    distribution)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def zorder_value(c1, c2, bits: int = 16):
    """Interleave the low ``bits`` of two non-negative integer columns
    into a single Z-order key (Morton code), JVM-side. Two shiftleft/or
    terms per bit — constant-folded into one codegen expression."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        b1 = F.shiftright(c1.cast("long"), i).bitwiseAND(F.lit(1))
        b2 = F.shiftright(c2.cast("long"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(b1, 2 * i)) \
             .bitwiseOR(F.shiftleft(b2, 2 * i + 1))
    return z


def write_zordered(df, path: str, col1: str, col2: str,
                   n_files: int = 8, bits: int = 16) -> None:
    """Z-order-clustered parquet layout: range-partition + sort by the
    Morton interleave of two filter columns, so each output file covers
    a small RECTANGLE in (col1, col2) space instead of a stripe. Parquet
    min/max footer stats on BOTH columns then prune files/row-groups for
    predicates on either column — the classic multi-dimensional data-
    skipping layout (Delta/Iceberg OPTIMIZE ZORDER does the same); a
    single-column sort gives perfect pruning on one column and none on
    the other."""
    from pyspark.sql import functions as F

    zed = df.withColumn("_z", zorder_value(F.col(col1), F.col(col2)))
    # repartitionByRange picks file boundaries by SAMPLING; the default
    # 100 rows/partition leaves visible boundary wobble (uneven files,
    # occasionally a file straddling a z-curve discontinuity). A larger
    # sample makes the quantile bounds near-exact for a negligible
    # one-pass cost — at scale this is the difference between balanced
    # and lopsided file sizes.
    spark = zed.sparkSession
    key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    prior = spark.conf.get(key, None)
    spark.conf.set(key, "5000")
    try:
        (zed.repartitionByRange(n_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
            .write.mode("overwrite").parquet(path))
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
