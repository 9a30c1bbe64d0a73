#!/usr/bin/env python
"""Generate a local sf1 decade from the driver's sf0.1 fixtures, for the
SCALE.md two-decade scaling study (the driver only ships sf0.001-0.1).

Method: replicate each fact table 10x with key offsets so every foreign
key lands in its replica's dimension block (customer/supplier/part also
x10; region/nation stay fixed like TPC-H). Text is deterministically
word-shuffled per replica so cross-replica documents are NOT near
duplicates (replicating verbatim would plant 45 artificial near-dup
pairs per original document and quadratically distort the dedup
queries); embeddings get fresh seeded gaussians (matching the original
distribution) rather than noisy copies, for the same reason.

Row counts at sf1: lineitem 6M, orders 1.5M, events 1M, documents 50k,
embeddings 8k (the driver's embeddings grow ~4x per decade).

    python tools/gen_sf1.py [out_dir]   # default /root/repo/localdata/sf1

Round 9: a third half-decade point for the corpus-linear class
(SCALE.md) — generate a documents-only sf3 (30 replicas) with

    python tools/gen_sf1.py /root/repo/localdata/sf3 30 documents
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10  # default; argv[2] overrides (key strides are per-replica,
               # so any count keeps keys disjoint)
EMB_FACTOR = 4

KEY_OFFSETS = {
    "customer": {"c_custkey": 15_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000,
                 "l_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "supplier": {"s_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": None},  # None -> max+1
    "documents": {"doc_id": 5_000},
}


def _shuffle_text(text: str, seed: int) -> str:
    words = text.split()
    random.Random(seed).shuffle(words)
    return " ".join(words)


def replicate(name: str, out_dir: str, replicas: int = REPLICAS) -> None:
    table = pq.read_table(f"{SRC}/{name}.parquet")
    offsets = KEY_OFFSETS.get(name, {})
    cols = {c: table.column(c).to_pandas() for c in table.column_names}
    if "user_id" in offsets and offsets["user_id"] is None:
        offsets = {**offsets, "user_id": int(cols["user_id"].max()) + 1}
    parts = []
    for i in range(replicas):
        rep = {}
        for c, series in cols.items():
            if c in offsets:
                rep[c] = series + i * offsets[c]
            elif name == "documents" and c == "text" and i > 0:
                rep[c] = pa.array(
                    [_shuffle_text(t, hash((i, j)) & 0x7FFFFFFF)
                     for j, t in enumerate(series)], type=pa.string())
            else:
                rep[c] = series
        parts.append(pa.table(
            {c: pa.array(rep[c]) if not isinstance(rep[c], pa.Array)
             else rep[c] for c in table.column_names},
            schema=table.schema))
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/{name}.parquet",
                   row_group_size=256 * 1024)


def gen_embeddings(out_dir: str) -> None:
    src = pq.read_table(f"{SRC}/embeddings.parquet")
    n, dim = src.num_rows, len(src.column("embedding")[0])
    n_new = n * (EMB_FACTOR - 1)
    rng = np.random.default_rng(42)
    # match the source's scale so cosine geometry is comparable
    flat = np.concatenate([np.asarray(v) for v in
                           src.column("embedding").to_pylist()[:200]])
    fresh = rng.normal(0.0, float(flat.std()),
                       size=(n_new, dim)).astype(np.float32)
    labels = rng.integers(0, int(max(src.column("label").to_pylist())) + 1,
                          size=n_new).astype(np.int32)
    new = pa.table({
        "vec_id": pa.array(range(n, n + n_new), type=pa.int64()),
        "embedding": pa.array([v for v in fresh.tolist()],
                              type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    }, schema=src.schema)
    pq.write_table(pa.concat_tables([src, new]),
                   f"{out_dir}/embeddings.parquet",
                   row_group_size=256 * 1024)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/localdata/sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else REPLICAS
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(out_dir, exist_ok=True)
    for name in ("region", "nation"):  # fixed-size dims: copy
        if only is None or name in only:
            pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"),
                           f"{out_dir}/{name}.parquet")
    for name in ("customer", "supplier", "part", "orders", "lineitem",
                 "events", "documents"):
        if only is not None and name not in only:
            continue
        replicate(name, out_dir, replicas)
        print(f"{name}: done", flush=True)
    if only is None or "embeddings" in only:
        gen_embeddings(out_dir)
        print("embeddings: done", flush=True)


if __name__ == "__main__":
    main()
