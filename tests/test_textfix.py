"""Mojibake repair (operators/textfix.py) — inversion, idempotence,
and no-touch contracts; full DuckDB value-hash parity (against a twin
that never runs the repair) via test_oracle_parity.py
(`mojibake_repair`)."""

from __future__ import annotations

from conftest import SF_DIR

from pyspark.sql import functions as F

from toymapreduce_go_spark.operators.textfix import (
    CORRUPT_MOD, mojibake_corpus, moji_pairs, repair_mojibake)
from toymapreduce_go_spark.sources.registry import load_table


def test_repair_is_exact_inverse_and_idempotent(spark):
    """For every document: repair(raw) == rich (corrupted docs are
    byte-exactly restored, clean docs untouched), and repairing twice
    changes nothing."""
    docs = load_table(spark, SF_DIR, "documents")
    d = (mojibake_corpus(docs)
         .withColumn("rep", repair_mojibake(F.col("raw")))
         .withColumn("rep2", repair_mojibake(F.col("rep"))))
    bad = d.filter((F.col("rep") != F.col("rich"))
                   | (F.col("rep2") != F.col("rep"))).count()
    assert bad == 0
    # the corruption class is exactly doc_id % CORRUPT_MOD == 0 and
    # actually corrupts (raw != rich) — the fixture is not vacuous
    n = d.count()
    n_cor = d.filter(F.col("raw") != F.col("rich")).count()
    assert n_cor == d.filter(
        F.pmod(F.col("doc_id"), F.lit(CORRUPT_MOD)) == 0).count()
    assert 0 < n_cor < n


def test_mapping_table_covers_classic_cases(spark):
    """The computed table includes the canonical ftfy examples, and
    the repair expression fixes them inside arbitrary context —
    including the BEL control strip."""
    pairs = dict(moji_pairs())
    assert pairs["’"] == "â€™"
    assert pairs["é"] == "Ã©"
    assert pairs["—"] == "â€”"
    df = spark.createDataFrame(
        [("itâ€™s a Ã©clair â€” yes\x07",),
         ("already clean ’ é —",)], "t string")
    got = [r.f for r in
           df.select(repair_mojibake(F.col("t")).alias("f")).collect()]
    assert got == ["it’s a éclair — yes", "already clean ’ é —"]


def test_repair_normalizes_crlf_and_lone_cr(spark):
    """r11 review finding, pinned: a CRLF document and its LF twin
    must repair to the same bytes (newline normalization is part of
    the dedup-key hygiene contract)."""
    df = spark.createDataFrame(
        [("a\r\nb\rc\n",), ("a\nb\nc\n",)], "t string")
    got = [r.f for r in
           df.select(repair_mojibake(F.col("t")).alias("f")).collect()]
    assert got[0] == got[1] == "a\nb\nc\n"
