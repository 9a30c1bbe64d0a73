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
