"""Sequence packing invariants (``operators/packing.py``).

FFD packing has no SQL oracle; these pin the contract instead: total
assignment, budget respect, id uniqueness, partitioning-independence,
and a fill-efficiency bound.
"""

from __future__ import annotations

from conftest import SF_DIR
from toymapreduce_go_spark.operators.packing import (pack_sequences,
                                                     packing_stats)

MAX_TOK = 256


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_every_doc_packed_exactly_once(spark):
    docs = _docs(spark)
    packed = pack_sequences(docs, MAX_TOK)
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()


def test_bins_respect_budget_except_oversize_singletons(spark):
    import pyspark.sql.functions as F
    packed = pack_sequences(_docs(spark), MAX_TOK)
    bins = packed.groupBy("bin_id").agg(
        F.sum("n_tok").alias("fill"),
        F.max("n_tok").alias("biggest"),
        F.sum(F.when(F.col("n_tok") > MAX_TOK, 1).otherwise(0))
        .alias("n_over"))
    # a bin over budget must be carried by a single oversize document
    bad = bins.filter((F.col("fill") > MAX_TOK)
                      & (F.col("n_over") == 0)).count()
    assert bad == 0


def test_packing_is_partitioning_invariant(spark):
    docs = _docs(spark)
    a = sorted((r["doc_id"], r["bin_id"])
               for r in pack_sequences(docs, MAX_TOK).collect())
    b = sorted((r["doc_id"], r["bin_id"])
               for r in pack_sequences(docs.repartition(7), MAX_TOK)
               .collect())
    assert a == b


def test_fill_efficiency_and_stats(spark):
    row = packing_stats(_docs(spark), MAX_TOK).collect()[0]
    assert row["n_docs"] == _docs(spark).count()
    # FFD with 64 shards on this corpus must beat half-full on average
    assert row["avg_fill_frac"] > 0.5
    # bin count sanity: no worse than 2x the perfect packing + 1 tail
    # bin per non-empty shard
    import pyspark.sql.functions as F
    from toymapreduce_go_spark.functions.text import bpe_ish_token_count
    total = (_docs(spark)
             .agg(F.sum(bpe_ish_token_count(F.col("text")))).collect()[0][0])
    perfect = -(-total // MAX_TOK)
    assert row["n_bins"] <= 2 * perfect + 64
