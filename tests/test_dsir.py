"""DSIR importance weighting: model shape, selection property, and the
100 TB plan posture (metadata-sized model broadcasts; the corpus is
never sort-merge-joined). Cross-engine value parity runs in
tests/test_oracle_parity.py like every other oracled query."""

from __future__ import annotations

import contextlib
import io

from toymapreduce_go_spark.operators.dsir import (DSIR_DIM,
                                                  dsir_doc_weights,
                                                  dsir_importance_stats,
                                                  dsir_log_ratio_model,
                                                  dsir_select)


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _toy_docs(spark):
    """Target slice (doc_id % 97 == 0) speaks 'physics'; raw docs 1-3
    speak physics too, raw docs 4-6 speak 'cooking' — disjoint vocab."""
    phys = "quantum field theory lattice gauge boson entangled spin"
    cook = "butter garlic saute onion simmer braise whisk dough"
    # the target slice repeats its vocabulary so the target model's
    # per-bucket mass clearly exceeds the raw pool's (with only one
    # occurrence each, Laplace smoothing keeps ratios near zero)
    rows = [
        (0, "t", " ".join([phys] * 10)),
        (97, "t", " ".join([phys + " hamiltonian operator"] * 10)),
        (1, "r", phys), (2, "r", phys + " spin boson"),
        (3, "r", "lattice gauge entangled quantum spin"),
        (4, "r", cook), (5, "r", cook + " season taste"),
        (6, "r", "simmer braise whisk butter onion dough"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string")


def test_model_is_bounded_by_dim(spark):
    docs = _toy_docs(spark)
    model = dsir_log_ratio_model(docs).collect()
    assert 0 < len(model) <= DSIR_DIM
    assert {r["b"] for r in model} <= set(range(DSIR_DIM))


def test_target_like_docs_outscore_disjoint_docs(spark):
    """The selection property the operator exists for: every raw doc
    sharing the target's vocabulary must outweigh every raw doc with
    disjoint vocabulary, and target docs must not appear in the pool."""
    w = {r["doc_id"]: r["w"]
         for r in dsir_doc_weights(_toy_docs(spark)).collect()}
    assert set(w) == {1, 2, 3, 4, 5, 6}  # targets 0/97 excluded
    assert min(w[1], w[2], w[3]) > max(w[4], w[5], w[6])
    assert all(w[d] > 0 for d in (1, 2, 3))      # preferred by target
    assert all(w[d] < 0 for d in (4, 5, 6))      # dispreferred


def test_stats_rollup_counts_preferred(spark):
    rows = {r["source"]: r
            for r in dsir_importance_stats(_toy_docs(spark)).collect()}
    assert set(rows) == {"r"}
    assert rows["r"]["n_docs"] == 6
    assert rows["r"]["n_preferred"] == 3
    assert rows["r"]["max_w"] > 0 > rows["r"]["min_w"]


def test_select_matches_brute_force_threshold(spark):
    """dsir_select's histogram cutoff against the Python brute force of
    its contract on the fixture: keep every pool doc whose rounded
    weight >= the quota-th largest (ties at the threshold all keep), so
    the kept set contains the top-quota and only threshold-tied
    extras."""
    import math

    from conftest import SF_DIR
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = {r["doc_id"]: r["w"] for r in dsir_doc_weights(docs).collect()}
    kept = {r["doc_id"]: r["w"] for r in
            dsir_select(docs, keep_frac=0.25).collect()}
    quota = math.ceil(len(w) * 0.25)
    cutoff = sorted(w.values(), reverse=True)[quota - 1]
    want = {d for d, v in w.items() if v >= cutoff}
    assert set(kept) == want
    assert len(kept) >= quota
    for d, v in kept.items():
        assert v == w[d]  # weights ride through unchanged


def test_select_boundary_fractions_and_featureless_docs(spark):
    """The review-found boundary class: keep_frac >= 1 keeps the WHOLE
    pool (not silently nothing), keep_frac = 0 keeps nothing, and a doc
    with zero extractable features ('12345...') still counts — neutral
    weight 0.0, kept under keep-everything."""
    rows = _toy_docs(spark).collect()
    docs = spark.createDataFrame(
        [(r["doc_id"], r["source"], r["text"]) for r in rows]
        + [(7, "r", "12345 !!! 67890")],  # no letter runs
        "doc_id long, source string, text string")
    w = {r["doc_id"]: r["w"] for r in dsir_doc_weights(docs).collect()}
    assert w[7] == 0.0
    every = {r["doc_id"]: r["w"]
             for r in dsir_select(docs, keep_frac=1.2).collect()}
    assert set(every) == {1, 2, 3, 4, 5, 6, 7}
    assert every[7] == 0.0
    none = dsir_select(docs, keep_frac=0.0).collect()
    assert none == []
    # integer-exact quota: 7 docs * 3/7 must take exactly 3 (double
    # ceil(7 * 0.42857...) could round the product up past 3)
    three = dsir_select(docs, keep_frac=3 / 7).collect()
    assert len(three) == 3


def test_select_in_pipeline_drops_target_slice(spark):
    """Composed into build_training_corpus, the selection stage keeps
    only pool keepers — target-slice docs (doc_id % 97 == 0) never
    reach the curated corpus."""
    from conftest import SF_DIR

    from toymapreduce_go_spark.pipeline import build_training_corpus

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter("doc_id < 250"))
    curated, funnel = build_training_corpus(
        spark, SF_DIR, docs=docs, dsir_frac=0.6)
    stages = dict((r["stage"], r["n_docs"]) for r in funnel.collect())
    assert "1d_dsir_selected" in stages
    assert 0 < stages["1d_dsir_selected"] <= stages["1_quality_gated"]
    assert curated.filter("doc_id % 97 = 0").count() == 0


def test_scoring_plan_broadcasts_model_no_sort_merge(spark):
    from conftest import SF_DIR
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan_of(dsir_importance_stats(docs))
    # the 1024-row log-ratio model rides a broadcast to the scorers;
    # the corpus is never shuffled for a join anywhere in the tree
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # per-doc sum + rollup both run partial-final (map-side combine)
    assert plan.count("HashAggregate") >= 4
