#!/usr/bin/env python
"""Two-decade scaling study for SCALE.md: time the FULL declared query
surface (round 7 — previously the 13 most expensive) at sf0.1 and the
locally generated sf1 (tools/gen_sf1.py), best-of-2, one session,
otherwise-idle machine. Prints per-query JSON per decade plus a
markdown table with the decade ratio; queries above FLAG_RATIO are
flagged — after round 7, only documented exact tiers should exceed it.

    python tools/scaling.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import materialize  # noqa: E402
from toymapreduce_go_spark.plans.queries import DECLARED, QUERIES  # noqa: E402
from toymapreduce_go_spark.session import build_session  # noqa: E402
from toymapreduce_go_spark.sources.registry import TABLES, load_table  # noqa: E402

FLAG_RATIO = 2.0


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
        # SPARK_GRAFT_SCALE_ONLY=a,b,c restricts the run (any registered
        # query, declared or pytest-tier); default = declared surface
        only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
        names = only.split(",") if only else list(DECLARED)
        for _pass in range(2):
            for name in names:
                t0 = time.perf_counter()
                materialize(QUERIES[name](spark, sf_dir))
                el = round(time.perf_counter() - t0, 2)
                if name not in timings or el < timings[name]:
                    timings[name] = el
        out[label] = timings
        print(json.dumps({label: timings}), flush=True)
    print(json.dumps(out))
    if len(out) == 2:
        (la, ta), (lb, tb) = out.items()
        print(f"\n| query | {la} | {lb} | ratio |")
        print("|---|---|---|---|")
        flagged = []
        for name in sorted(ta, key=lambda n: -tb.get(n, 0) / max(ta[n], .01)):
            if name not in tb:
                continue
            r = tb[name] / max(ta[name], 0.01)
            mark = " **FLAG**" if r > FLAG_RATIO else ""
            if r > FLAG_RATIO:
                flagged.append(name)
            print(f"| {name} | {ta[name]:.2f} s | {tb[name]:.2f} s "
                  f"| {r:.2f}×{mark} |")
        print(f"\nflagged (> {FLAG_RATIO}x per decade): "
              f"{flagged or 'none'}")


if __name__ == "__main__":
    main()
