"""The kvtext Python DataSource: the reference's "key value" interchange
format as a first-class Spark read/write format (F16). Round-trips must
be lossless against both its own writer and the write_text_kv sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from toymapreduce_go_spark.sources.kvtext import register
from toymapreduce_go_spark.sources.sinks import write_text_kv

ROWS = [("apple", "3"), ("banana", "1 2 7"), ("cherry", "xyzzy")]


def test_write_then_read_roundtrip(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "kv_out")
    df = spark.createDataFrame(ROWS, "key string, value string")
    df.write.format("kvtext").mode("append").save(out)
    back = spark.read.format("kvtext").load(out)
    assert back.columns == ["key", "value"]
    assert {tuple(r) for r in back.collect()} == set(ROWS)
    # layout parity: reference-style mr-out-N part files
    files = sorted(p.name for p in (tmp_path / "kv_out").iterdir())
    assert files and all(f.startswith("mr-out-") for f in files)


def test_value_with_spaces_splits_on_first_space_only(spark, tmp_path):
    """crash.go's reduce joins values with ' ' — the reader must keep
    the whole remainder as the value."""
    register(spark)
    out = str(tmp_path / "kv_spaces")
    spark.createDataFrame([("k", "a b c d")], "key string, value string") \
        .write.format("kvtext").mode("append").save(out)
    got = spark.read.format("kvtext").load(out).collect()
    assert [(r.key, r.value) for r in got] == [("k", "a b c d")]


def test_reads_write_text_kv_output(spark, tmp_path):
    """Interop: the existing text sink (the CLI's output format) is
    readable through the data source, with sink-written _SUCCESS/hidden
    files skipped."""
    register(spark)
    out = str(tmp_path / "sink_out")
    df = spark.createDataFrame(ROWS, "key string, value string")
    write_text_kv(df, out)
    back = spark.read.format("kvtext").load(out)
    assert {tuple(r) for r in back.collect()} == set(ROWS)


def test_overwrite_replaces_previous_run(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "kv_ow")
    mk = lambda rows: spark.createDataFrame(rows, "key string, value string")
    mk(ROWS).write.format("kvtext").mode("append").save(out)
    mk([("solo", "1")]).write.format("kvtext").mode("overwrite").save(out)
    back = spark.read.format("kvtext").load(out)
    assert {tuple(r) for r in back.collect()} == {("solo", "1")}


def test_filter_and_agg_compose_over_source(spark, tmp_path):
    """The source feeds the full DataFrame engine like any other scan."""
    register(spark)
    out = str(tmp_path / "kv_q")
    spark.createDataFrame(
        [(f"k{i % 3}", str(i)) for i in range(30)],
        "key string, value string",
    ).write.format("kvtext").mode("append").save(out)
    got = (spark.read.format("kvtext").load(out)
           .filter(F.col("key") != "k2")
           .groupBy("key").agg(F.count("*").alias("n"))
           .orderBy("key").collect())
    assert [(r.key, r.n) for r in got] == [("k0", 10), ("k1", 10)]


def test_unrepresentable_rows_fail_loudly(spark, tmp_path):
    """The line format can't encode spaces-in-key or newlines; the
    writer must error instead of writing a file that reads back
    differently."""
    import pytest

    register(spark)
    for rows in ([("bad key", "v")], [("k", "line1\nline2")]):
        out = str(tmp_path / f"kv_bad_{abs(hash(str(rows)))}")
        df = spark.createDataFrame(rows, "key string, value string")
        with pytest.raises(Exception, match="kvtext"):
            df.write.format("kvtext").mode("append").save(out)
