"""apply_near_dedup: the materializing cluster-dedup contract."""

from __future__ import annotations

from conftest import SF_DIR
from toymapreduce_go_spark.operators.dedup import (apply_near_dedup,
                                                   connected_components,
                                                   near_dedup_minhash)


def test_apply_near_dedup_keeps_exactly_cluster_survivors(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    kept = apply_near_dedup(docs)
    pairs = near_dedup_minhash(docs).select("doc_a", "doc_b")
    comp = connected_components(pairs)
    n_losers = comp.filter("doc_id != cluster_id").count()
    assert n_losers > 0  # fixture plants near-dups
    assert kept.count() == docs.count() - n_losers
    # every cluster's min id survives; no loser survives
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    for r in comp.collect():
        if r["doc_id"] == r["cluster_id"]:
            assert r["doc_id"] in kept_ids
        else:
            assert r["doc_id"] not in kept_ids
    # schema passes through untouched
    assert kept.columns == docs.columns
