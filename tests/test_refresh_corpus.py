"""Delta-driven corpus refresh (operators/refresh.py:
refresh_training_corpus) — the curated-output twin of the index
refreshes: retract stale rows, re-curate only the delta, screen it
against the kept corpus."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from toymapreduce_go_spark.operators.refresh import (
    corpus_delta, refresh_training_corpus)
from toymapreduce_go_spark.pipeline import build_training_corpus

SF = "/root/testdata/sf0.001"   # only used for the default-table hook

_VOCAB = ["".join(t) for t in itertools.islice(
    itertools.product("abcdefghij", repeat=6), 500)]


def _text(i: int) -> str:
    rng = random.Random(i)
    return f"doc {i} " + " ".join(rng.sample(_VOCAB, 80))


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, f"src{i % 4}", "en", t) for i, t in rows],
        "doc_id long, source string, lang string, text string")


def test_corpus_delta_statuses_and_null_text(spark):
    old = _docs(spark, [(1, "a"), (2, "b"), (3, "c"), (4, None)])
    new = _docs(spark, [(2, "b"), (3, "CHANGED"), (4, None), (5, "e")])
    got = {r.doc_id: r.status for r in corpus_delta(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "unchanged", 5: "added"}


def test_corpus_delta_metadata_change_is_changed(spark):
    """Same text, re-labeled lang/source -> 'changed' (the kept
    curated row must not retain stale metadata); frames lacking the
    metadata columns fall back to text-only fingerprints."""
    old = _docs(spark, [(1, "a"), (2, "b")])
    new = (_docs(spark, [(1, "a"), (2, "b")])
           .withColumn("lang", F.when(F.col("doc_id") == 2,
                                      F.lit("fr")).otherwise("en")))
    got = {r.doc_id: r.status for r in corpus_delta(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed"}
    # text-only frames: metadata folding degrades gracefully
    bare_old = old.select("doc_id", "text")
    bare_new = new.select("doc_id", "text")
    got = {r.doc_id: r.status
           for r in corpus_delta(bare_old, bare_new).collect()}
    assert got == {1: "unchanged", 2: "unchanged"}


def test_refresh_matches_full_rebuild_up_to_survivor_preference(spark):
    """The equality contract on a cluster-disjoint construction, with
    every interaction class planted:

    - removed docs (5,6,7) leave; a plain changed doc (11) returns
      with its new text; added docs (101-105) enter;
    - an added EXACT dup of a kept doc (107 == 21) is Bloom-screened;
      an added NEAR dup of a kept doc (106 ~ 20) is band-screened —
      both with the same outcome a full rebuild's min-id dedup gives;
    - the ONE documented divergence: changed doc 10's new text
      near-dups kept doc 30 — the full rebuild keeps min-id 10, the
      refresh keeps the prior survivor 30. Everything else is
      row-identical (bin_id excluded: packing bins are
      generation-local, pinned disjoint instead);
    - decontamination runs against a FIXED benchmark frame
      (``eval_docs`` — the production form), so a contaminated ADDED
      doc (108 overlaps the benchmark text) is dropped by the refresh
      delta run and the full rebuild alike: with a corpus-independent
      eval set there is no decontamination divergence to disclose."""
    old_rows = [(i, _text(i)) for i in range(1, 61)]
    old = _docs(spark, old_rows).localCheckpoint()
    ev = _docs(spark, [(0, _text(999))]).select("text").localCheckpoint()
    prior_curated, _ = build_training_corpus(spark, SF, docs=old,
                                             eval_docs=ev)
    prior_curated = prior_curated.localCheckpoint()
    assert prior_curated.count() == 60   # cluster-disjoint by design

    txt = dict(old_rows)
    new_rows = ([(i, txt[i]) for i in range(1, 61)
                 if i not in (5, 6, 7, 10, 11)]
                + [(10, txt[30] + " extra words here"),
                   (11, txt[11] + " refreshed edition text"),
                   (106, txt[20] + " extra words here"),
                   (107, txt[21]),
                   (108, _text(999) + " benchmark leak")]
                + [(i, _text(i)) for i in range(101, 106)])
    new = _docs(spark, new_rows).localCheckpoint()

    curated, report = refresh_training_corpus(
        spark, SF, old, new, prior_curated, eval_docs=ev)
    got = {r.doc_id: (r.source, r.lang, r.text)
           for r in curated.collect()}
    full, _ = build_training_corpus(spark, SF, docs=new, eval_docs=ev)
    want = {r.doc_id: (r.source, r.lang, r.text)
            for r in full.collect()}

    # the planted interaction outcomes
    assert 107 not in got and 106 not in got        # screened
    assert 107 not in want and 106 not in want      # deduped
    assert 108 not in got and 108 not in want       # decontaminated
    assert 10 in want and 30 not in want            # min-id survivor
    assert 30 in got and 10 not in got              # prior survivor
    # everything else row-identical
    del want[10], got[30]
    assert got == want

    # report: exact delta classification
    rep = {r.stage: r.n_docs for r in report.collect()}
    assert rep["0_delta_added"] == 8        # 101-105, 106, 107, 108
    assert rep["0_delta_removed"] == 3
    assert rep["0_delta_changed"] == 2
    assert rep["0_delta_unchanged"] == 55
    assert rep["3_total"] == curated.count()

    # packing bins never collide across generations
    kept_bins = {r.bin_id for r in curated.join(
        prior_curated.select("doc_id"), "doc_id", "left_semi")
        .select("bin_id").distinct().collect()}
    delta_bins = {r.bin_id for r in curated.join(
        prior_curated.select("doc_id"), "doc_id", "left_anti")
        .select("bin_id").distinct().collect()}
    assert delta_bins and kept_bins
    assert not kept_bins & delta_bins


def _long_text(i: int) -> str:
    rng = random.Random(1000 + i)
    return f"long doc {i} " + " ".join(rng.sample(_VOCAB, 400))


def test_refresh_retracts_chunked_long_docs(spark):
    """chunk_long on the refresh path: a changed long doc's PRIOR
    chunk rows (negative synthetic ids -(doc*2^24 + chunk + 1)) leave
    with it — the refresh must retract by ORIGINATING document, not
    raw id, or stale chunks persist beside the re-chunked new rows —
    a removed long doc's chunks vanish, an unchanged long doc's
    chunks survive, and the refreshed corpus equals the full rebuild
    row-for-row INCLUDING ids (chunk ids are deterministic)."""
    old_rows = ([(i, _text(i)) for i in range(1, 11)]
                + [(i, _long_text(i)) for i in (50, 51, 52)])
    old = _docs(spark, old_rows).localCheckpoint()
    prior_curated, _ = build_training_corpus(spark, SF, docs=old,
                                             chunk_long=True)
    prior_curated = prior_curated.localCheckpoint()
    prior_ids = {r.doc_id for r in prior_curated.select("doc_id")
                 .collect()}
    assert any(i < 0 for i in prior_ids)     # chunks actually exist
    assert 50 not in prior_ids               # long docs ride as chunks

    # 50 changes (prefix edit so every chunk's text shifts), 51 is
    # removed, 52 unchanged, 60 added short
    new_rows = ([(i, _text(i)) for i in range(1, 11)]
                + [(50, "now refreshed " + _long_text(50)),
                   (52, _long_text(52)),
                   (60, _text(60))])
    new = _docs(spark, new_rows).localCheckpoint()

    curated, report = refresh_training_corpus(
        spark, SF, old, new, prior_curated, chunk_long=True)
    curated = curated.localCheckpoint()
    full, _ = build_training_corpus(spark, SF, docs=new,
                                    chunk_long=True)
    got = {r.doc_id: r.text for r in curated.collect()}
    want = {r.doc_id: r.text for r in full.collect()}
    assert curated.count() == len(got)       # no duplicate ids
    assert got == want                       # ids AND texts identical
    rep = {r.stage: r.n_docs for r in report.collect()}
    assert rep["0_delta_changed"] == 1 and rep["0_delta_removed"] == 1


def test_refresh_rejects_managed_pipeline_knobs(spark):
    """prior_docs/near_prior/docs are driven by the refresh protocol
    itself; passing them through pipeline_knobs must fail loudly, not
    as a duplicate-keyword TypeError deep in the funnel."""
    import pytest

    old = _docs(spark, [(1, "a")])
    with pytest.raises(TypeError, match="prior_docs"):
        refresh_training_corpus(spark, SF, old, old, old,
                                prior_docs=old)
