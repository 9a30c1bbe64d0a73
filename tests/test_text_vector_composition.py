"""Cross-family composition: text → hashed_tf vectors → kNN.

The similarity operators take any (vec_id, embedding) frame; hashed_tf
turns text into exactly that, so the two families compose with a
rename. Near-identical texts must come back as each other's top
neighbor with cosine ≈ 1."""

from __future__ import annotations

import pyspark.sql.functions as F

from toymapreduce_go_spark.operators.similarity import knn_bruteforce
from toymapreduce_go_spark.operators.textstats import hashed_tf_embeddings


def test_hashed_tf_feeds_knn(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
         (3, "entirely unrelated text about database engines"),
         (4, "database engines process entirely unrelated text"),  # ~3
         (5, "completely disjoint vocabulary here indeed")],
        "doc_id long, text string")
    vecs = (hashed_tf_embeddings(docs)
            .select(F.col("doc_id").alias("vec_id"),
                    F.col("vec").cast("array<float>").alias("embedding")))
    out = knn_bruteforce(vecs, n_probes=5, k=1)
    top = {r["probe_id"]: (r["neighbor_id"], r["cos_sim"])
           for r in out.collect()}
    assert top[1][0] == 2 and top[2][0] == 1
    assert top[1][1] > 0.8
    assert top[3][0] == 4 and top[4][0] == 3


def test_hashed_tf_feeds_ivf_pq(spark):
    """The PQ tier composes with text vectors the same way: planted
    near-duplicate texts must surface as each other's top neighbor
    through the full encode -> ADC -> refine chain. The hashed_tf dim
    (64 by default) divides PQ_M, so the subspace split just works."""
    from toymapreduce_go_spark.operators.similarity import ann_ivf_pq
    from toymapreduce_go_spark.operators.textstats import \
        hashed_tf_embeddings

    base = "the quick brown fox jumps over the lazy"
    rows = [(1, f"{base} dog"), (2, f"{base} cat")]
    rows += [(i, f"filler document number {i} with distinct words "
                 f"alpha{i} beta{i} gamma{i}") for i in range(3, 20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = (hashed_tf_embeddings(docs)
            .select(F.col("doc_id").alias("vec_id"),
                    F.col("vec").cast("array<float>").alias("embedding")))
    out = ann_ivf_pq(vecs, n_probes=2, k=1, n_cells=2)
    top = {r["probe_id"]: (r["neighbor_id"], r["approx_cos"])
           for r in out.collect()}
    assert top[1][0] == 2 and top[2][0] == 1
    assert top[1][1] > 0.8


def test_tfidf_prefers_distinctive_over_frequent(spark):
    """The reweighting TF-IDF exists for: a corpus-wide stopword
    ('the', in every doc -> idf ln(N+1 / N+1) = 0) contributes NOTHING,
    so a single occurrence of a rare word out-weights five of the
    stopword; hashed_tf's raw argmax picks the frequent bucket
    instead."""
    from toymapreduce_go_spark.functions.text import tokens
    from toymapreduce_go_spark.operators.textstats import (
        hashed_tf_summary, tfidf_summary)
    from pyspark.sql import functions as F

    rows = [(i, "the " * 5 + "filler%d" % i) for i in range(9)]
    rows.append((9, "the " * 5 + "zebra"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def bucket(word):
        import hashlib
        return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % 64

    tf = {r["doc_id"]: r for r in hashed_tf_summary(docs).collect()}
    ti = {r["doc_id"]: r for r in tfidf_summary(docs).collect()}
    assert tf[9]["top_bucket"] == bucket("the")      # raw counts: 5 > 1
    assert ti[9]["top_bucket"] == bucket("zebra")    # idf: 0 vs ln(11/2)
    assert ti[9]["top_tfidf"] > 0.99                 # zebra is ~the vector
