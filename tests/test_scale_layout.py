"""Storage-layout scale evidence: the two layout levers SCALE.md leans
on — bucketing (removes the fact⋈fact shuffle) and partition pruning
(removes I/O before it happens) — proven on real plans, not prose."""

from __future__ import annotations

import contextlib
import io

from conftest import SF_DIR

from pyspark.sql import functions as F

from toymapreduce_go_spark.sources.registry import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """lineitem⋈orders on orderkey is the surface's only fact-fact
    shuffle; with both sides bucketed on the join key the sort-merge
    join must read bucket-aligned scans with ZERO Exchange nodes."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb "
              f"LOCATION '{tmp_path}/bucketdb'")
    try:
        load_table(spark, SF_DIR, "orders").write \
            .bucketBy(8, "o_orderkey").sortBy("o_orderkey") \
            .mode("overwrite").saveAsTable("bucketdb.b_orders")
        load_table(spark, SF_DIR, "lineitem").write \
            .bucketBy(8, "l_orderkey").sortBy("l_orderkey") \
            .mode("overwrite").saveAsTable("bucketdb.b_lineitem")
        joined = (
            spark.table("bucketdb.b_lineitem").hint("merge")
            .join(spark.table("bucketdb.b_orders"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(joined)
        join_part = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part, join_part
        # sanity: result matches the unbucketed join
        want = (load_table(spark, SF_DIR, "lineitem")
                .join(load_table(spark, SF_DIR, "orders"),
                      F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")))
        assert sorted(map(tuple, joined.collect())) == \
               sorted(map(tuple, want.collect()))
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-partitioned parquet by source: a source-filtered read must
    prune at planning time (PartitionFilters), scanning one directory."""
    out = f"file://{tmp_path}/docs_by_source"
    docs = load_table(spark, SF_DIR, "documents")
    docs.write.partitionBy("source").mode("overwrite").parquet(out)
    one = spark.read.parquet(out).filter(F.col("source") == "src1") \
        .select("doc_id", "n_chars")
    plan = _plan(one)
    assert "PartitionFilters" in plan
    frag = plan.split("PartitionFilters")[1][:120]
    assert "src1" in frag, frag
    want = docs.filter(F.col("source") == "src1").count()
    assert one.count() == want


def test_zorder_layout_narrows_both_column_ranges(spark, tmp_path):
    """Z-order vs single-column sort, measured on the actual parquet
    footers: with a linear sort on col1, every file spans ~the full col2
    domain; Z-ordered files must cover a strictly smaller fraction of
    the col2 domain on average (that coverage fraction IS the expected
    scan fraction for a col2 predicate)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from toymapreduce_go_spark.sources.bucketing import write_zordered

    # two independent uniform dims — the worst case for a linear sort
    df = (spark.range(40000)
          .select(F.pmod(F.xxhash64("id"), F.lit(4096)).alias("x"),
                  F.pmod(F.xxhash64("id", F.lit(1)), F.lit(4096))
                  .alias("y")))

    linear = f"{tmp_path}/linear"
    (df.repartitionByRange(8, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(linear))
    zpath = f"{tmp_path}/zorder"
    write_zordered(df, zpath, "x", "y", n_files=8, bits=12)

    def avg_span_frac(path, col, domain=4096):
        import glob
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            los, his = [], []
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                stats = {rg.column(j).path_in_schema:
                         rg.column(j).statistics
                         for j in range(rg.num_columns)}[col]
                los.append(stats.min)
                his.append(stats.max)
            spans.append((max(his) - min(los) + 1) / domain)
        return sum(spans) / len(spans)

    lin_y = avg_span_frac(linear, "y")
    z_y = avg_span_frac(zpath, "y")
    z_x = avg_span_frac(zpath, "x")
    # linear layout: y is unsorted everywhere -> files span ~full domain
    assert lin_y > 0.9
    # z-order: both dims materially narrowed per file. Headroom over the
    # typical ~0.5 because range-partition boundaries come from sampling
    # and can straddle a z-curve discontinuity; write_zordered raises
    # the sample size to keep that rare, not impossible.
    assert z_y < 0.65, f"z-order y span {z_y}"
    assert z_x < 0.65, f"z-order x span {z_x}"
