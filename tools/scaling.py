#!/usr/bin/env python
"""Two-decade scaling study for SCALE.md: time the most expensive
declared queries at sf0.1 and the locally generated sf1
(tools/gen_sf1.py), best-of-2, one session, otherwise-idle machine.

    python tools/scaling.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import materialize  # noqa: E402
from toymapreduce_go_spark.plans.queries import QUERIES  # noqa: E402
from toymapreduce_go_spark.session import build_session  # noqa: E402
from toymapreduce_go_spark.sources.registry import TABLES, load_table  # noqa: E402

TOP = [
    # family: relational
    "pricing_summary", "order_priority_window", "lineitem_price_quartiles",
    # family: events
    "events_sessionize", "events_sliding",
    # family: text/dedup
    "ngram_jaccard_pairs", "near_dedup_minhash", "simhash_hamming",
    "curation_pipeline",
    # family: embeddings
    "embedding_near_dup", "ann_lsh", "ann_ivf_trained",
    # family: multimodal
    "multimodal_pipeline",
]


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1",
                               "/root/repo/localdata/sf1"]
    spark = build_session("scaling-study")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, float]] = {}
    for sf_dir in sf_dirs:
        for t in TABLES:  # warm footers
            load_table(spark, sf_dir, t).count()
        label = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        timings: dict[str, float] = {}
        for _pass in range(2):
            for name in TOP:
                t0 = time.perf_counter()
                materialize(QUERIES[name](spark, sf_dir))
                el = round(time.perf_counter() - t0, 2)
                if name not in timings or el < timings[name]:
                    timings[name] = el
        out[label] = timings
        print(json.dumps({label: timings}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
