#!/usr/bin/env python
"""Measure recall@k of the approximate similarity operators against the
exact bruteforce baseline, per scale factor. Writes the table RECALL.md
records (run manually; the numbers are committed, not regenerated per
round, because training/probing parameters are fixed).

    python tools/recall.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from toymapreduce_go_spark.operators import similarity  # noqa: E402
from toymapreduce_go_spark.session import build_session  # noqa: E402
from toymapreduce_go_spark.sources.registry import load_table  # noqa: E402

K = 5

APPROX = {
    "ann_lsh (portable, 4 bands x 6 planes)":
        lambda emb: similarity.ann_lsh_portable(emb, k=K),
    "ann_lsh (prod sketch, 4 bands x 12 planes)":
        lambda emb: similarity.ann_lsh(emb, k=K),
    "ann_lsh (prod recall-leaning, 8 bands x 8 planes)":
        lambda emb: similarity.ann_lsh(emb, k=K, n_planes=8, n_bands=8),
    "ann_ivf (seed centroids, 16 cells, probe 2)":
        lambda emb: similarity.ann_ivf(emb, k=K),
    "ann_ivf_trained (Lloyd's x3, 8 cells, probe 2)":
        lambda emb: similarity.ann_ivf_trained(emb, k=K),
    "ann_ivf_pq (m=8 ksub=64, RAW codes, pure ADC)":
        lambda emb: similarity.ann_ivf_pq(emb, k=K, refine=0,
                                          by_residual=False),
    "ann_ivf_pq (m=8 ksub=64, residual codes, pure ADC)":
        lambda emb: similarity.ann_ivf_pq(emb, k=K, refine=0),
    "ann_ivf_pq (m=16 ksub=64, residual codes, pure ADC)":
        lambda emb: similarity.ann_ivf_pq(emb, k=K, refine=0, m=16),
    "ann_ivf_pq (m=8 ksub=64, residual, refine 32k exact — default)":
        lambda emb: similarity.ann_ivf_pq(emb, k=K),
    "ann_index_probe_pq (persisted codes, refine 32k exact, r13)":
        lambda emb: _persisted_pq_probe(emb),
}


def _persisted_pq_probe(emb):
    """Build the PQ-coded persisted index in a temp dir and probe it —
    the r13 on-disk tier (coarse quantizer = the flat index's rule, so
    routing matches `ann_query_index`; codes shortlist, corpus parquet
    refines)."""
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix="tmrg_recall_pq_")
    try:
        similarity.write_vector_index_pq(emb, path)
        out = similarity.ann_query_index_pq(emb, emb, path, k=K)
        out = out.localCheckpoint()   # materialize before cleanup
        return out
    finally:
        shutil.rmtree(path, ignore_errors=True)


def topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.probe_id, set()).add(r.neighbor_id)
    return out


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = build_session("recall-measure")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"| operator | {' | '.join(d.rstrip('/').rsplit('/', 1)[-1] for d in sf_dirs)} |")
    print(f"|---|{'---|' * len(sf_dirs)}")
    rows = {name: [] for name in APPROX}
    for sf_dir in sf_dirs:
        emb = load_table(spark, sf_dir, "embeddings")
        exact = topk_sets(similarity.knn_bruteforce(emb, k=K))
        for name, fn in APPROX.items():
            approx = topk_sets(fn(emb))
            hits = sum(len(exact[p] & approx.get(p, set())) for p in exact)
            total = sum(len(v) for v in exact.values())
            rows[name].append(f"{hits / total:.2f}")
    for name, vals in rows.items():
        print(f"| {name} | {' | '.join(vals)} |")


if __name__ == "__main__":
    main()
