#!/usr/bin/env python
"""Capture .explain("formatted") for every declared + tier2 query into
plans/r15/<query>_<tag>.txt. Usage: python tools/capture_plans_r15.py before
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from toymapreduce_go_spark.plans.queries import DECLARED, QUERIES  # noqa: E402
from toymapreduce_go_spark.session import build_session  # noqa: E402

TIER2 = ["image_phash", "audio_fingerprint", "video_fingerprint",
         "heavy_hitters", "semantic_dedup", "fetch_list"]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(DECLARED) + TIER2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("capture-plans-r15")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR {type(exc).__name__}: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(text)
        print(f"captured {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
