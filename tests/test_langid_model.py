"""Trained lang-id (operators/langid_model.py) contracts.

Oracle parity (training + scoring replayed in DuckDB, value-hash) is
covered by the auto-iterating tests/test_oracle_parity.py entry
``langid_trained``. These tests pin what the fixture CANNOT show — the
sf documents share one vocabulary across langs, so real linguistic
separation needs a constructed multilingual corpus — plus the
scan-side-scoring plan claim and training determinism."""

from __future__ import annotations

import random

from conftest import SF_DIR
from test_explain_plans import plan_of

from toymapreduce_go_spark.operators.langid_model import (
    langid_confusion, langid_predict, train_langid)
from toymapreduce_go_spark.sources.registry import load_table

# Genuinely different character distributions per language: common
# function/content words, accents included (UTF-8 bytes feed the md5
# gram hash, so accented 2-grams are strong features).
POOLS = {
    "en": ("the and of to in that with for was his which this from have "
           "not they would there their what about when could other").split(),
    "de": ("der die und das nicht von ist mit sich auf für werden über "
           "schön größe straße müssen zwischen während außerdem").split(),
    "fr": ("le la les et de des une était être avec pour dans était "
           "français où déjà après très jamais même toujours ça").split(),
    "es": ("el la los y de que en un ser con por para como está más "
           "también años señor niño mañana corazón según").split(),
}


def _corpus(spark, docs_per_lang: int = 40, words: int = 30):
    rng = random.Random(20260815)
    rows = []
    doc_id = 0
    for lang, pool in sorted(POOLS.items()):
        for _ in range(docs_per_lang):
            rows.append((doc_id, lang,
                         " ".join(rng.choice(pool) for _ in range(words)),
                         "synth"))
            doc_id += 1
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string")


def test_multilingual_accuracy_floor(spark):
    """On a corpus whose languages actually differ, the trained
    classifier's holdout accuracy clears 0.95 — the contract the
    heuristic marker-word lang_id cannot make (its markers cover four
    fixed words per language; the trained model uses every 2-gram)."""
    docs = _corpus(spark)
    conf = langid_confusion(docs).collect()
    total = sum(r.n_docs for r in conf)
    correct = sum(r.n_docs for r in conf if r.lang == r.pred_lang)
    assert total >= 30  # holdout is ~1/5 of 160 docs
    assert correct / total >= 0.95, conf


def test_training_is_deterministic(spark):
    docs = _corpus(spark, docs_per_lang=10)
    m1 = train_langid(docs)
    m2 = train_langid(docs)
    assert m1 == m2
    assert sorted(m1) == ["de", "en", "es", "fr"]
    assert all(len(w) == 1024 for w in m1.values())
    # weights are per-million normalized: each language sums to <= 1e6
    # (integer floor division loses at most dim ulps)
    for w in m1.values():
        assert 1_000_000 - 1024 <= sum(w) <= 1_000_000


def test_scoring_is_scan_side(spark):
    """The 100 TB claim: scoring never joins or shuffles the corpus —
    the model rides in as plan literals and every score is a codegen
    fold. Only training (one combinable agg) and the final confusion
    groupBy shuffle."""
    docs = load_table(spark, SF_DIR, "documents")
    model = train_langid(docs.limit(50))
    plan = plan_of(langid_predict(docs, model))
    for op in ("Join", "Exchange", "Window", "ArrowEvalPython",
               "MapInPandas", "BatchEvalPython"):
        assert op not in plan, (op, plan)


def test_fixture_confusion_is_deterministic_not_linguistic(spark):
    """The sf fixture's langs share one vocabulary — the registered
    query certifies cross-engine determinism there, not linguistics;
    this pins the disclosed shape: every holdout doc is scored, and
    predictions land in the trained label set."""
    docs = load_table(spark, SF_DIR, "documents")
    conf = langid_confusion(docs).collect()
    n_hold = docs.filter("doc_id % 5 = 0 and length(lower(text)) >= 2") \
                 .count()
    assert sum(r.n_docs for r in conf) == n_hold
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert {r.pred_lang for r in conf} <= langs | {"unknown"}


def test_predict_many_languages_single_literal(spark):
    """The r10 advisory: at fastText-scale language counts the model
    must ride as ONE nested-array literal with scores in ONE array —
    never one unrolled fold per language (the r9 per-centroid-unroll
    codegen explosion). 64 synthesized languages over 50 fixture docs
    must analyze + run in interactive time and stay deterministic."""
    import time

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .limit(50).select("doc_id", "text"))
    rng = random.Random(11)
    model = {f"lang{i:02d}": [rng.randrange(0, 1000) for _ in range(1024)]
             for i in range(64)}
    t0 = time.perf_counter()
    out = langid_predict(docs, model)
    # the load-independent discriminator: the scores column is ONE
    # transform over ONE literal — the unrolled form carried one
    # aggregate-fold expression per language (64 here). The analyzed
    # plan therefore names `aggregate(` O(1) times, not O(langs).
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("aggregate(") <= 4, \
        f"per-language unrolling is back: " \
        f"{analyzed.count('aggregate(')} folds"
    rows = {r["doc_id"]: r["pred_lang"] for r in out.collect()}
    elapsed = time.perf_counter() - t0
    # generous wall backstop only (a loaded 32-thread host showed 31 s
    # on a 30 s bound with NO regression — r11); the plan assertion
    # above is the real gate
    assert elapsed < 120, f"codegen/analysis blow-up: {elapsed:.1f}s"
    assert len(rows) == 50
    assert set(rows.values()) <= set(model) | {"unknown"}
    # deterministic across runs
    again = {r["doc_id"]: r["pred_lang"]
             for r in langid_predict(docs, model).collect()}
    assert again == rows


def test_predict_argmax_tiebreak_is_lowest_language(spark):
    """array_position takes the FIRST maximum = ascending language
    order — the exact greatest+when-chain / ORDER BY s DESC, cand ASC
    semantics the oracle replays. Construct a dead tie and a score gap
    and check both against a driver-side replay."""
    from toymapreduce_go_spark.operators.langid_model import (
        _gram_buckets)

    docs = spark.createDataFrame(
        [(1, "abcd"), (2, "xy")], "doc_id long, text string")
    buckets = {r["doc_id"]: list(r["b"]) for r in docs.select(
        "doc_id", _gram_buckets().alias("b")).collect()}
    # zz ties with aa everywhere (identical weights): aa must win;
    # ww wins doc 2's buckets outright
    base = [1] * 1024
    ww = [1] * 1024
    for b in buckets[2]:
        ww[b] = 50
    model = {"zz": list(base), "aa": list(base), "ww": ww}
    got = {r["doc_id"]: r["pred_lang"]
           for r in langid_predict(docs, model).collect()}
    assert got[2] == "ww"
    # doc 1: ww has weight 1 on doc 1's buckets unless they collide
    # with doc 2's — compute the expected winner driver-side
    scores = {lang: sum(model[lang][b] for b in buckets[1])
              for lang in model}
    best = max(scores.values())
    expect = min(lang for lang, s in scores.items() if s == best)
    assert got[1] == expect
