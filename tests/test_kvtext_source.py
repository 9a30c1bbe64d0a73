"""The kvtext Python DataSource: the reference's "key value" interchange
format as a first-class Spark read/write format (F16). Round-trips must
be lossless against both its own writer and the write_text_kv sink.

Round 7: all filesystem access goes through the scheme→client registry
(``sources.fs``, twin of the reference's fsutil.SupportedFS /
Register, pkg/fsutil/fsclient.go:14-45) — the mock-scheme tests at the
bottom prove a registered non-"file" scheme works end-to-end through
read, write, AND the rename-on-commit protocol, with the client
pickled out to executor Python workers."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

from toymapreduce_go_spark.sources.fs import (LocalFsClient, fs_for,
                                              register_fs, split_scheme)
from toymapreduce_go_spark.sources.kvtext import register
from toymapreduce_go_spark.sources.sinks import write_text_kv

try:  # the mock client class must ship to Python workers by value
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:
    pass

ROWS = [("apple", "3"), ("banana", "1 2 7"), ("cherry", "xyzzy")]


class PrefixFsClient(LocalFsClient):
    """Mock scheme client: maps ``mock://rest`` to ``<base>/rest`` on
    the local disk — the state lives on a real filesystem so executor
    worker processes and the driver see the same files, while every
    path still travels through the registry's translation (a real
    object-store client would translate to API calls instead)."""

    calls: int = 0  # proves resolution went through the registry

    def __init__(self, base: str):
        self.base = base

    def _p(self, path: str) -> str:  # overrides the staticmethod
        scheme, rest = split_scheme(path)
        assert scheme == "mock", path
        return os.path.join(self.base, rest)


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
    # "" key: with a None value it would write a bare newline the reader
    # skips as a blank line — a silently lost row
    for rows in ([("bad key", "v")], [("k", "line1\nline2")],
                 [("", "v")], [("", None)]):
        out = str(tmp_path / f"kv_bad_{abs(hash(str(rows)))}")
        df = spark.createDataFrame(rows, "key string, value string")
        with pytest.raises(Exception, match="kvtext"):
            df.write.format("kvtext").mode("append").save(out)


def test_zero_partition_write_commits_empty_dir(spark, tmp_path):
    """A write over an empty 0-partition frame runs no tasks, so only
    commit() touches the filesystem — it must still produce a valid
    (empty) output dir, and a subsequent read must see zero rows."""
    register(spark)
    out = str(tmp_path / "kv_empty")
    from pyspark.sql.types import StringType, StructField, StructType
    schema = StructType([StructField("key", StringType()),
                         StructField("value", StringType())])
    empty = spark.createDataFrame(spark.sparkContext.emptyRDD(), schema)
    assert empty.rdd.getNumPartitions() == 0
    empty.write.format("kvtext").mode("overwrite").save(out)
    import os
    assert os.path.isdir(out)
    assert spark.read.format("kvtext").load(out).count() == 0


def test_second_append_does_not_clobber_first(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "kv_app2")
    mk = lambda rows: spark.createDataFrame(rows, "key string, value string")
    mk(ROWS).write.format("kvtext").mode("append").save(out)
    mk([("extra", "9")]).write.format("kvtext").mode("append").save(out)
    back = spark.read.format("kvtext").load(out)
    assert {tuple(r) for r in back.collect()} == set(ROWS) | {("extra", "9")}


def test_overwrite_clears_foreign_layout_files(spark, tmp_path):
    """overwrite must remove data written by write_text_kv (part-*) too,
    not only its own mr-out-* files — otherwise the next read unions old
    and new data."""
    register(spark)
    out = str(tmp_path / "kv_ow2")
    df = spark.createDataFrame(ROWS, "key string, value string")
    write_text_kv(df, out)
    spark.createDataFrame([("only", "1")], "key string, value string") \
        .write.format("kvtext").mode("overwrite").save(out)
    back = spark.read.format("kvtext").load(out)
    assert {tuple(r) for r in back.collect()} == {("only", "1")}


def test_null_value_roundtrips(spark, tmp_path):
    """(k, None) -> bare 'k' line -> (k, None): read-write-read is
    lossless, matching the reader's no-space semantics."""
    register(spark)
    out = str(tmp_path / "kv_null")
    spark.createDataFrame([("k", None), ("j", "v")],
                          "key string, value string") \
        .write.format("kvtext").mode("append").save(out)
    got = {(r.key, r.value)
           for r in spark.read.format("kvtext").load(out).collect()}
    assert got == {("k", None), ("j", "v")}


def test_extra_columns_rejected(spark, tmp_path):
    """Columns beyond (key, value) would be silently dropped by the line
    format — refuse instead."""
    import pytest

    register(spark)
    df = spark.createDataFrame([("k", "v", 1)],
                               "key string, value string, n int")
    with pytest.raises(Exception, match="kvtext"):
        df.write.format("kvtext").mode("append") \
          .save(str(tmp_path / "kv_extra"))


def test_registered_scheme_write_commit_read_roundtrip(spark, tmp_path):
    """fsutil.Register parity: a scheme registered at runtime is fully
    usable — write (executor-side temp files through the client),
    commit (driver-side rename protocol), read (listing + streaming) —
    with mr-out-N layout landing under the mock root."""
    base = str(tmp_path / "mockroot")
    register_fs("mock", lambda: PrefixFsClient(base))
    register(spark)  # AFTER register_fs: the registry ships with the source
    df = spark.createDataFrame(ROWS, "key string, value string")
    df.write.format("kvtext").mode("append").save("mock://job1/out")
    # the physical files live under the translated root, mr-out layout
    names = sorted(os.listdir(os.path.join(base, "job1/out")))
    assert names and all(n.startswith("mr-out-") for n in names)
    back = spark.read.format("kvtext").load("mock://job1/out")
    assert {tuple(r) for r in back.collect()} == set(ROWS)
    # overwrite + append semantics hold through the scheme too
    spark.createDataFrame([("solo", "1")], "key string, value string") \
        .write.format("kvtext").mode("overwrite").save("mock://job1/out")
    spark.createDataFrame([("extra", "2")], "key string, value string") \
        .write.format("kvtext").mode("append").save("mock://job1/out")
    got = {tuple(r) for r in
           spark.read.format("kvtext").load("mock://job1/out").collect()}
    assert got == {("solo", "1"), ("extra", "2")}


def test_unregistered_scheme_fails_loudly(spark):
    """ErrUnsupportFS parity: an unknown scheme must raise, not fall
    back to local paths."""
    import pytest

    from toymapreduce_go_spark.sources.fs import UnsupportedScheme

    with pytest.raises(UnsupportedScheme, match="scheme"):
        fs_for("s3x://bucket/key")
    register(spark)
    with pytest.raises(Exception, match="scheme"):
        spark.read.format("kvtext").load("s3x://bucket/key").collect()


def test_file_scheme_and_bare_path_equivalent(spark, tmp_path):
    """The built-in client accepts both 'file://<abs>' and bare paths,
    like the reference's TrimPrefix normalization."""
    register(spark)
    out = str(tmp_path / "kv_scheme")
    spark.createDataFrame(ROWS, "key string, value string") \
        .write.format("kvtext").mode("append").save(f"file://{out}")
    bare = spark.read.format("kvtext").load(out)
    via_scheme = spark.read.format("kvtext").load(f"file://{out}")
    assert ({tuple(r) for r in bare.collect()}
            == {tuple(r) for r in via_scheme.collect()} == set(ROWS))


def test_failed_write_leaves_no_temp_files(spark, tmp_path):
    """A task that raises mid-write must unlink its partial temp file
    (abort() never hears about files from failed tasks)."""
    import pytest

    register(spark)
    out = tmp_path / "kv_fail"
    df = spark.createDataFrame([("ok", "1"), ("bad key", "2")],
                               "key string, value string").coalesce(1)
    with pytest.raises(Exception, match="kvtext"):
        df.write.format("kvtext").mode("append").save(str(out))
    leftovers = [p.name for p in out.iterdir()] if out.exists() else []
    assert leftovers == [], leftovers


def test_kvtext_malformed_lines_defined_behavior(spark, tmp_path):
    """Dirty input contract: blank lines skip, a line with no space
    yields (key, NULL), extra spaces stay in the value (first-space
    split — the reference sink's exact inverse)."""
    p = tmp_path / "dirty.txt"
    p.write_text("alpha 1\n\nnospace\nbeta 2 with spaces\n  leading\n")
    df = (spark.read.format("kvtext").load(str(p))
          .orderBy("key"))
    rows = [(r["key"], r["value"]) for r in df.collect()]
    assert rows == [
        ("", " leading"),          # leading space -> empty key
        ("alpha", "1"),
        ("beta", "2 with spaces"),
        ("nospace", None),
    ]
