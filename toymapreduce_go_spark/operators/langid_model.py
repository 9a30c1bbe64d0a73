"""Trained language ID — hashed char-n-gram classifier (the fastText
lang-id recipe, linearized): TRAIN counts hashed character n-grams per
labeled language into a fixed ``dim``-bucket table and normalizes each
language's bucket counts to integer per-million weights; PREDICT scores
every document scan-side against the broadcast weight arrays and argmaxes.

Why this shape at 100 TB:

- **Training is one combinable aggregation** over the labeled slice
  (explode grams → ``groupBy(lang, bucket)`` count — map-side partial
  agg, exactly the wordcount shuffle), and the model is metadata-sized
  BY CONSTRUCTION: ≤ ``n_langs × dim`` rows regardless of corpus size.
  Like ``quality_distill``'s teacher, the labeled slice is a sample —
  a pipeline labels thousands of documents, not the corpus.
- **Scoring is scan-side**: the per-language weight arrays are
  plan-literal (ONE ``ArrayType`` literal each, the bloom/CMS
  convention), and each document's score is an ``aggregate`` fold over
  its gram-bucket array — whole-stage codegen, no join, no shuffle, no
  Python. The only shuffle in the registered query is the final
  confusion-matrix groupBy.
- **Integer-exact end to end** (full DuckDB value-hash parity, unlike
  the float-logprob NB formulation): weights are
  ``count * scale div total`` (integer division), scores are int64
  sums, and the argmax tie-break is deterministic (ascending language
  precedence). The md5-prefix bucket hash is the repo's portable gram
  hash (``dedup.py`` convention), so DuckDB replays training AND
  scoring bit-for-bit.

The heuristic ``textstats.lang_id`` stays as the zero-training baseline;
this is the trained upgrade the round-9 verdict asked for (item 7). The
reference has no language surface at all (SURVEY.md §2c) — this is
north-star pipeline coverage. Accuracy on a genuinely multilingual
corpus is pinned in ``tests/test_langid_model.py`` (the sf fixture's
languages share one vocabulary, so the registered confusion matrix
there certifies determinism, not linguistics — disclosed here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIM = 1024          # hash buckets per language
NGRAM = 2           # character n-gram width
SCALE = 1_000_000   # integer per-million weight normalization


def _gram_buckets(text_col: str = "text", n: int = NGRAM,
                  dim: int = DIM) -> Column:
    """array<bigint> of hashed char-n-gram buckets for one document:
    ``pmod(md5_60bit(substring(lower(text), i, n)), dim)`` for
    i = 1 .. len-n+1. Pure per-row expression; the CASE guards the
    downward-stepping ``sequence(1, 0)`` on short strings."""
    t = f"lower({text_col})"
    return F.expr(
        f"CASE WHEN length({t}) >= {n} THEN "
        f"transform(sequence(1, length({t}) - {n - 1}), i -> "
        f"pmod(cast(conv(substring(md5(substring({t}, i, {n})), 1, 15), "
        f"16, 10) as bigint), {dim})) "
        f"ELSE array() END")


def train_langid(labeled: DataFrame, n: int = NGRAM, dim: int = DIM,
                 scale: int = SCALE) -> dict[str, list[int]]:
    """Fit the model on (text, lang): per-language dense weight arrays
    of length ``dim``, ``weight[b] = count(b) * scale div total_grams``.
    The collect is ≤ ``n_langs × dim`` rows — model-sized, not
    corpus-sized (the same bound class as the BPE/CMS collects)."""
    counts = (labeled
              .select("lang", F.explode(_gram_buckets(n=n, dim=dim))
                      .alias("b"))
              .groupBy("lang", "b").agg(F.count(F.lit(1)).alias("c")))
    tot = counts.groupBy("lang").agg(F.sum("c").alias("tot"))
    rows = (counts.join(tot, "lang")
            .select("lang", "b",
                    F.expr(f"c * {scale} div tot").alias("w"))
            .collect())
    langs = sorted({r["lang"] for r in rows})
    model = {lang: [0] * dim for lang in langs}
    for r in rows:
        model[r["lang"]][int(r["b"])] = int(r["w"])
    return model


def langid_predict(documents: DataFrame, model: dict[str, list[int]],
                   n: int = NGRAM, dim: int = DIM) -> DataFrame:
    """Score every document against the broadcast weight arrays and
    argmax (ties: ascending language order — the deterministic
    precedence the oracle replays as ``ORDER BY s DESC, cand ASC``).
    Scan-side only: literal arrays + aggregate folds, no join.

    The whole model rides as ONE nested-array literal and the scores
    land in ONE array column via ``transform`` — never one unrolled
    fold per language (the r9 codegen lesson: per-centroid/-language
    unrolling re-inlines the shared gram array N times and analysis/
    codegen explodes at fastText-scale language counts; pinned by the
    64-language plan test). ``array_position`` returns the FIRST
    maximum = the lowest language index = ascending-order tie-break,
    exactly the old ``greatest`` + ascending when-chain semantics."""
    langs = sorted(model)
    weights = F.lit([model[lang] for lang in langs])
    scored = (documents
              .withColumn("_b", _gram_buckets(n=n, dim=dim))
              .withColumn("_sc", F.transform(
                  weights,
                  lambda w: F.aggregate(
                      F.col("_b"), F.lit(0).cast("long"),
                      lambda acc, x:
                      acc + F.element_at(w, x.cast("int") + 1)))))
    pred = F.when(F.size("_b") == 0, F.lit("unknown")).otherwise(
        F.element_at(
            F.lit(langs),
            F.array_position(F.col("_sc"),
                             F.array_max(F.col("_sc"))).cast("int")))
    return scored.withColumn("pred_lang", pred).drop("_b", "_sc")


def langid_confusion(documents: DataFrame, n: int = NGRAM,
                     dim: int = DIM, scale: int = SCALE,
                     holdout_mod: int = 5) -> DataFrame:
    """The registered query: train on ``doc_id % holdout_mod != 0``,
    predict the held-out rest, emit (lang, pred_lang, n_docs). Both
    splits drop documents shorter than one gram (same predicate in the
    oracle)."""
    usable = documents.filter(F.length(F.lower("text")) >= n)
    # pmod, the r10 lesson (ids keying a split/grid) — for a ==0 / !=0
    # comparison signed % happens to agree, but the convention is pmod
    # everywhere so the next edit can't reintroduce the signed-% trap
    split = F.pmod(F.col("doc_id"), F.lit(holdout_mod))
    train = usable.filter(split != 0)
    hold = usable.filter(split == 0)
    model = train_langid(train, n=n, dim=dim, scale=scale)
    if not model:
        # no training data -> no model -> nothing scorable (the oracle's
        # empty-weights cross join is empty the same way)
        return documents.sparkSession.createDataFrame(
            [], "lang string, pred_lang string, n_docs long")
    return (langid_predict(hold, model, n=n, dim=dim)
            .groupBy("lang", "pred_lang")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("lang", "pred_lang"))
