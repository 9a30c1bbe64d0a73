#!/usr/bin/env python
"""Third-decade evidence for SCALE.md's corpus-linear class (round 9,
verdict item 4): time the three >2.5×/decade queries — with their scale
knobs ON and OFF — at sf1 (tools/gen_sf1.py) and a documents-only sf3
(gen_sf1.py with 30 replicas), each (variant, sf) in its OWN subprocess
session (batched in-session runs inflate ratios ~30%; measured r8).

    python tools/gen_sf1.py /root/repo/localdata/sf1
    python tools/gen_sf1.py /root/repo/localdata/sf3 30 documents
    python tools/third_decade.py            # runs the matrix, prints table
    python tools/third_decade.py --one VARIANT SF_DIR   # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/root/repo/localdata/sf1"
SF3 = "/root/repo/localdata/sf3"

VARIANTS = {
    # name -> lambda docs -> DataFrame (documents-only queries)
    "dup_spans_exact":
        lambda d, dedup, ts, mm: dedup.dup_span_stats(d),
    "dup_spans_p8_k40":
        lambda d, dedup, ts, mm: dedup.dup_span_stats(d, k=40,
                                                      sample_mod=8),
    "lm_bigram_exact":
        lambda d, dedup, ts, mm: ts.lm_bigram_quality(d),
    "lm_bigram_pruned_bcast":
        lambda d, dedup, ts, mm: ts.lm_bigram_quality(
            d, min_count=5, broadcast_bigrams=True),
    "video_stats":
        lambda d, dedup, ts, mm: mm(d),
    # r9 skew-safe sampling rewrite: prove the flat curve holds a third
    # half-decade (both read only the documents table)
    "epoch_sample":
        lambda d, dedup, ts, mm: ts.epoch_sample_stats(d),
    "stratified_sample":
        lambda d, dedup, ts, mm: ts.stratified_sample_stats(d),
    "ccnet_buckets":
        lambda d, dedup, ts, mm: ts.ccnet_bucket_stats(d),
    "dsir_importance":
        lambda d, dedup, ts, mm: _dsir().dsir_importance_stats(d),
    "tfidf":
        lambda d, dedup, ts, mm: ts.tfidf_summary(d),
    "unigram_tok":
        lambda d, dedup, ts, mm: _unitok().unigram_tok_stats(d),
    # r9 incremental batch near-dedup: pair-join op → third-decade rule
    "near_dedup_vs_prior":
        lambda d, dedup, ts, mm: dedup.near_dedup_vs_prior_split(d),
    # r9 multimodal dedup tiers: the decode-every-item linear class —
    # prove the slope holds a third half-decade (no knobs by design)
    "image_phash":
        lambda d, dedup, ts, mm: _phash().image_phash_pairs(d),
    "audio_fingerprint":
        lambda d, dedup, ts, mm: _afp().audio_fingerprint_pairs(d),
    "video_fingerprint":
        lambda d, dedup, ts, mm: _vfp().video_fingerprint_pairs(d),
    # r11 crawl-scheduling capstone: the one join-bearing r11 addition
    # over 2 s at sf0.1 (PageRank iterations + the politeness window)
    "crawl_frontier":
        lambda d, dedup, ts, mm: _frontier().crawl_frontier(d),
}


def _frontier():
    from toymapreduce_go_spark.operators import frontier
    return frontier


def _phash():
    from toymapreduce_go_spark.multimodal import phash
    return phash


def _afp():
    from toymapreduce_go_spark.multimodal import audiofp
    return audiofp


def _vfp():
    from toymapreduce_go_spark.multimodal import videofp
    return videofp


def _unitok():
    from toymapreduce_go_spark.operators import unigram_tok
    return unigram_tok


def _dsir():
    from toymapreduce_go_spark.operators import dsir
    return dsir


def run_one(variant: str, sf_dir: str) -> None:
    from bench import materialize
    from toymapreduce_go_spark.operators import dedup, textstats
    from toymapreduce_go_spark.plans.queries import QUERIES
    from toymapreduce_go_spark.session import build_session
    from toymapreduce_go_spark.sources.registry import load_table

    spark = build_session("third-decade")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()  # warm footers

    def mm(d):
        return QUERIES["video_stats"](spark, sf_dir)

    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        materialize(VARIANTS[variant](docs, dedup, textstats, mm))
        el = time.perf_counter() - t0
        best = el if best is None or el < best else best
    print(json.dumps({"variant": variant, "sf": sf_dir,
                      "best": round(best, 2)}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        run_one(sys.argv[2], sys.argv[3])
        return
    out: dict[str, dict[str, float]] = {}
    for variant in VARIANTS:
        for sf in (SF1, SF3):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one",
                 variant, sf],
                capture_output=True, text=True, check=True)
            row = json.loads(r.stdout.strip().splitlines()[-1])
            out.setdefault(variant, {})[sf] = row["best"]
            print(f"{variant} @ {sf.rsplit('/', 1)[-1]}: "
                  f"{row['best']:.2f} s", flush=True)
    print("\n| variant | sf1 | sf3 (×3 data) | step ratio (linear = 3.0) |")
    print("|---|---|---|---|")
    for variant, t in out.items():
        r = t[SF3] / max(t[SF1], 0.01)
        print(f"| {variant} | {t[SF1]:.2f} s | {t[SF3]:.2f} s | {r:.2f}× |")


if __name__ == "__main__":
    main()
