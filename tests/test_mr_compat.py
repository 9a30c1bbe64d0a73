"""Map/reduce compat API tests — parity with the reference's plugin
contract (pkg/mr/mr.go) and with the declarative operators."""

from __future__ import annotations


from conftest import SF_DIR

from toymapreduce_go_spark.mr.api import (KeyValue, indexer_map,
                                          indexer_reduce, run_map_reduce,
                                          run_map_reduce_files, simple_reduce,
                                          wc_map, wc_reduce)
from toymapreduce_go_spark.operators.text_mr import wordcount
from toymapreduce_go_spark.sources.registry import load_table


def test_wc_matches_declarative(spark):
    """mr-compat wordcount == DataFrame wordcount (the §2d #16 parity)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    mr = run_map_reduce(spark, wc_map, wc_reduce, docs, n_reduce=4)
    mr_rows = {(r.key, int(r.value)) for r in mr.collect()}
    df_rows = {(r.word, r.cnt) for r in wordcount(
        load_table(spark, SF_DIR, "documents")).collect()}
    assert mr_rows == df_rows


def test_grouped_reduce_streams_per_key(spark):
    """ReduceFunc is called once per distinct key with that key's whole
    value group (oracle semantics, mrsequential.go:71-87 — NOT the
    reference's broken per-file reduce, Appendix A.3)."""
    rows = [("f1", "a a b"), ("f2", "b c")]
    docs = spark.createDataFrame(rows, "filename string, content string")

    seen: list[tuple[str, int]] = []

    def reduce_f(key, values):
        vals = list(values)
        yield f"{len(vals)}"

    out = run_map_reduce(spark, wc_map, reduce_f, docs, n_reduce=2)
    got = {(r.key, r.value) for r in out.collect()}
    # b appears in both files: exactly ONE reduce group of size 2
    assert got == {("a", "2"), ("b", "2"), ("c", "1")}
    _ = seen


def test_simple_reduce_wrapper(spark):
    """The (key, [values]) -> value convention (7 of 8 reference apps)."""
    docs = spark.createDataFrame([("f1", "x y"), ("f2", "y")],
                                 "filename string, content string")
    out = run_map_reduce(
        spark, wc_map, simple_reduce(lambda k, vs: str(len(vs))), docs, 2)
    assert {(r.key, r.value) for r in out.collect()} == {("x", "1"), ("y", "2")}


def test_indexer_app(spark):
    """indexer.go semantics: '{n} doc1,doc2' with sorted distinct docs."""
    docs = spark.createDataFrame(
        [("d1", "apple banana apple"), ("d2", "banana cherry")],
        "filename string, content string")
    out = run_map_reduce(spark, indexer_map, indexer_reduce, docs, 2)
    got = {(r.key, r.value) for r in out.collect()}
    assert got == {("apple", "1 d1"), ("banana", "2 d1,d2"),
                   ("cherry", "1 d2")}


def test_whole_file_input(spark, tmp_path):
    """run_map_reduce_files: wholeTextFiles (filename, content) input unit
    — the reference's F1 scan (fsutil.ReadAll)."""
    for name, text in [("a.txt", "hello world"), ("b.txt", "hello")]:
        (tmp_path / name).write_text(text)
    out = run_map_reduce_files(
        spark, wc_map, wc_reduce, f"file://{tmp_path}/*.txt", 2)
    got = {(r.key, int(r.value)) for r in out.collect()}
    assert got == {("hello", 2), ("world", 1)}


def test_kv_is_stringly_typed():
    """KeyValue mirrors mr.KeyValue{Key,Value string} (mr.go:91-94)."""
    kv = KeyValue("k", "v")
    assert kv.key == "k" and kv.value == "v"
    assert wc_map("f", "one two one") == [
        KeyValue("one", "1"), KeyValue("two", "1"), KeyValue("one", "1")]
