"""Semantic pin for the near-dup family: at test scale the MinHash-LSH
pipeline (16 bands x 4 rows, s-curve threshold ~0.5) must recover
exactly the pairs the exact n-gram Jaccard query reports at >= 0.5 —
the fixture's planted near-duplicates sit well above the threshold, so
estimator noise must not add or drop pairs."""

from __future__ import annotations

from conftest import SF_DIR

from toymapreduce_go_spark.plans.queries import QUERIES


def test_minhash_recovers_exact_jaccard_pairs(spark):
    exact = {(r.doc_a, r.doc_b)
             for r in QUERIES["ngram_jaccard_pairs"](spark, SF_DIR).collect()}
    approx = {(r.doc_a, r.doc_b)
              for r in QUERIES["near_dedup_minhash"](spark, SF_DIR).collect()}
    assert exact, "fixture should contain planted near-duplicates"
    assert approx == exact
