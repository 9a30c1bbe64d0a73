#!/usr/bin/env python
"""Wall-clock / row-count evidence for the vocabulary-bounding knobs,
measured on the OPEN-vocabulary Zipf fixture (tools/gen_zipf.py) —
closing the disclosed FIXTURES.md gap where the 31-word corpus made
these knobs plan-asserted only. One JSON line per study; results
published in SCALE.md.

    python tools/zipf_knobs.py --one {bpe,bigram,heavy,unigram}
    # subprocess-isolate each study (the SCALE.md methodology: batch
    # runs inflate numbers ~30% from JVM heap/cache interference)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ZIPF_DIR = os.environ.get("SPARK_GRAFT_ZIPF_DIR",
                          "/root/repo/localdata/zipf")


def session():
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.driver.memory", "16g")
            .config("spark.python.worker.reuse", "true")
            .getOrCreate())


def docs(spark):
    return spark.read.parquet(f"{ZIPF_DIR}/documents.parquet")


def study_bpe(spark):
    """train_bpe: the driver-collected word-frequency table is the
    state bound; min_count/max_vocab must visibly cap it."""
    from toymapreduce_go_spark.operators.bpe import (train_bpe,
                                                     word_frequencies)
    d = docs(spark)
    rows_exact = word_frequencies(d).count()
    rows_mc = word_frequencies(d, min_count=5).count()
    t0 = time.time()
    m_exact = train_bpe(d, n_merges=30)
    t_exact = time.time() - t0
    t0 = time.time()
    m_bound = train_bpe(d, n_merges=30, min_count=5, max_vocab=8192)
    t_bound = time.time() - t0
    return {"study": "bpe", "distinct_words": rows_exact,
            "rows_min_count_5": rows_mc, "rows_max_vocab": 8192,
            "train_s_exact": round(t_exact, 2),
            "train_s_bounded": round(t_bound, 2),
            "merges_equal_prefix": sum(
                1 for a, b in zip(m_exact, m_bound) if a == b)}


def study_bigram(spark):
    """lm_bigram_quality: exact tier shuffles the corpus on the bigram
    key; min_count collapses the model to the Zipf head so
    broadcast_bigrams scores without any corpus shuffle."""
    from pyspark.sql import functions as F
    from toymapreduce_go_spark.functions.text import tokens
    from toymapreduce_go_spark.operators.textstats import \
        lm_bigram_quality
    d = docs(spark)
    toks = F.filter(F.transform(tokens("text"), lambda t: F.lower(t)),
                    lambda t: F.length(t) > 0)
    bi = (d.select(toks.alias("tks"))
          .filter(F.size("tks") >= 2)
          .select(F.explode(F.expr(
              "transform(sequence(1, size(tks) - 1), i -> "
              "struct(element_at(tks, i) as w1, "
              "element_at(tks, i + 1) as w2))")).alias("b"))
          .groupBy("b.w1", "b.w2").count())
    model_exact = bi.count()
    model_pruned = bi.filter(F.col("count") >= 5).count()
    t0 = time.time()
    lm_bigram_quality(d).collect()
    t_exact = time.time() - t0
    t0 = time.time()
    lm_bigram_quality(d, min_count=5, broadcast_bigrams=True).collect()
    t_pruned = time.time() - t0
    return {"study": "bigram", "model_rows_exact": model_exact,
            "model_rows_min_count_5": model_pruned,
            "score_s_exact": round(t_exact, 2),
            "score_s_pruned_broadcast": round(t_pruned, 2)}


def study_heavy(spark):
    """heavy_hitters: the CMS gate must let only a sliver of the open
    vocabulary reach the exact-count shuffle."""
    from pyspark.sql import functions as F
    from toymapreduce_go_spark.functions.text import tokens
    from toymapreduce_go_spark.operators.sketches import (CMS_DEPTH,
                                                          _cms_pos,
                                                          heavy_hitters)
    d = docs(spark)
    t0 = time.time()
    hitters = heavy_hitters(d, threshold_milli=5).collect()
    t_run = time.time() - t0
    # candidate rate: replay the gate (operator internals) and count
    # distinct words passing the sketch estimate
    tok = d.select(F.explode(tokens("text")).alias("word"))
    rows = (tok.select(F.explode(F.array(*[
        F.struct(F.lit(dd).alias("d"),
                 _cms_pos(dd, F.col("word")).alias("p"))
        for dd in range(CMS_DEPTH)])).alias("s"))
        .groupBy("s.d", "s.p").count().collect())
    import collections
    cms = collections.defaultdict(int)
    for r in rows:
        cms[(int(r["d"]), int(r["p"]))] = int(r["count"])
    n_total = sum(v for (dd, _), v in cms.items() if dd == 0)
    min_count = -(-n_total * 5 // 1000)
    counters = [[cms[(dd, p)] for p in range(4096)]
                for dd in range(CMS_DEPTH)]
    lits = [F.lit(row) for row in counters]
    est = F.least(*[F.element_at(lits[dd],
                                 _cms_pos(dd, F.col("word"))
                                 .cast("int") + 1)
                    for dd in range(CMS_DEPTH)])
    n_candidates = (tok.filter(est >= F.lit(min_count))
                    .select("word").distinct().count())
    n_vocab = tok.select("word").distinct().count()
    return {"study": "heavy", "vocab": n_vocab,
            "candidates": n_candidates, "true_hitters": len(hitters),
            "min_count": min_count, "run_s": round(t_run, 2)}


def study_unigram(spark):
    """lm_quality: min_count prunes the broadcast unigram model to the
    Zipf head; pruned docs fall to the smoothing floor."""
    from pyspark.sql import functions as F
    from toymapreduce_go_spark.functions.text import tokens
    from toymapreduce_go_spark.operators.textstats import lm_quality
    d = docs(spark)
    toks = F.filter(F.transform(tokens("text"), lambda t: F.lower(t)),
                    lambda t: F.length(t) > 0)
    uni = (d.select(F.explode(toks).alias("w"))
           .groupBy("w").count())
    rows_exact = uni.count()
    rows_pruned = uni.filter(F.col("count") >= 500).count()
    t0 = time.time()
    lm_quality(d).collect()
    t_exact = time.time() - t0
    t0 = time.time()
    lm_quality(d, min_count=500).collect()
    t_pruned = time.time() - t0
    return {"study": "unigram", "model_rows_exact": rows_exact,
            "model_rows_min_count_500": rows_pruned,
            "score_s_exact": round(t_exact, 2),
            "score_s_pruned": round(t_pruned, 2)}


STUDIES = {"bpe": study_bpe, "bigram": study_bigram,
           "heavy": study_heavy, "unigram": study_unigram}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", choices=sorted(STUDIES), required=True)
    args = ap.parse_args()
    spark = session()
    out = STUDIES[args.one](spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
