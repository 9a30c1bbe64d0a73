"""Sketch-assisted exact aggregation (operators/sketches.py, round 9):
the CMS candidate pass must be provably invisible — exact results on
skewed constructed frames, no false hitters from counter collisions,
and a scan-side candidate gate in the plan."""

from __future__ import annotations

import pytest

from conftest import SF_DIR

from toymapreduce_go_spark.operators.sketches import heavy_hitters
from toymapreduce_go_spark.sources.registry import load_table


def test_heavy_hitters_exact_on_skewed_frame(spark):
    """A dominant word + a Zipf-ish tail: exactly the words above the
    ceil(0.5% N) cutoff come back, with exact counts, in (count desc,
    word) order — no tail word rides a CMS collision into the result."""
    rows = []
    doc = 0
    for word, reps in [("boiler", 400), ("plate", 300), ("the", 250)]:
        for _ in range(reps):
            rows.append((doc, "s", word)); doc += 1
    for i in range(1000):   # 1000 singleton tail words (letters only —
        # the tokenizer drops digits, so f"tail{i}" would collapse into
        # one 1000-count word)
        w = "".join(chr(97 + (i // 26 ** k) % 26) for k in range(3))
        rows.append((doc, "s", f"tail{w}x")); doc += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")
    got = [(r["word"], r["n_occurrences"])
           for r in heavy_hitters(docs).collect()]
    # N = 1950, cutoff = ceil(9.75) = 10
    assert got == [("boiler", 400), ("plate", 300), ("the", 250)]


def test_heavy_hitters_threshold_is_exact_ceil(spark):
    """Cutoff arithmetic: integer ceil, not float rounding — a word AT
    the cutoff stays, one below it goes."""
    # N = 202 tokens; "once"/"only" each appear exactly twice
    rows = ([(i, "s", "dup word") for i in range(99)]      # 198 tokens
            + [(100, "s", "once only"), (101, "s", "once only")])
    docs = spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")
    # milli=5: cutoff = ceil(202*0.005) = ceil(1.01) = 2 — the
    # count-2 words sit exactly AT the cutoff and stay
    got = {r["word"]: r["n_occurrences"]
           for r in heavy_hitters(docs, threshold_milli=5).collect()}
    assert got == {"dup": 99, "word": 99, "once": 2, "only": 2}
    # milli=10: cutoff = ceil(2.02) = 3 — one below, they fall out
    got = {r["word"]: r["n_occurrences"]
           for r in heavy_hitters(docs, threshold_milli=10).collect()}
    assert got == {"dup": 99, "word": 99}


def test_heavy_hitters_rejects_float_threshold():
    with pytest.raises(ValueError):
        heavy_hitters(None, threshold_milli=0.5)
    with pytest.raises(ValueError):
        heavy_hitters(None, threshold_milli=0)


def test_heavy_hitters_plan_gates_before_exact_count(spark):
    """Plan contract: no join anywhere (the sketch is a plan literal),
    and the candidate gate — a Filter mentioning the least() of
    element_at lookups — sits below the word aggregation, so only
    passing tokens reach the exact-count shuffle."""
    from test_explain_plans import plan_of

    docs = load_table(spark, SF_DIR, "documents")
    plan = plan_of(heavy_hitters(docs))
    assert "Join" not in plan, plan
    assert "least(" in plan and "element_at" in plan, plan
