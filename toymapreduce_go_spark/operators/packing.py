"""Sequence packing for training-batch construction.

Pretraining dataloaders pack documents into fixed-token-budget
sequences; doing it in the engine (instead of the loader) makes the
packing reproducible and shardable. Greedy first-fit-decreasing (FFD)
is inherently sequential, so the distributed form shards first:

- ``n_tok`` is computed JVM-side (``bpe_ish_token_count``) so the
  Python stage never sees text — each Arrow batch carries two ints per
  document.
- Documents shard by ``xxhash64(doc_id) % n_shards`` (uniform,
  deterministic); each shard packs independently with FFD inside one
  ``applyInPandas`` group. Cross-shard waste is bounded by at most one
  partial bin per shard, so fill factor converges to single-node FFD as
  shards fill; ``n_shards`` scales with cluster width at 100 TB.
- ``bin_id = shard << 32 | local_bin`` keeps ids globally unique
  without any cross-shard coordination.

Oversized documents (``n_tok > max_tokens``) get a bin of their own —
splitting/truncating them is the tokenizer's decision, not the
packer's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import bpe_ish_token_count

PACK_SCHEMA = "doc_id long, n_tok long, shard int, bin_id long"


def _pack_shard(pdf):
    """FFD within one shard: sort by (n_tok desc, doc_id asc), place each
    doc in the first bin with room. Deterministic for a given shard
    membership regardless of input partitioning."""
    import pandas as pd

    pdf = pdf.sort_values(["n_tok", "doc_id"],
                          ascending=[False, True], kind="mergesort")
    shard = int(pdf["shard"].iloc[0])
    cap = int(pdf["cap"].iloc[0])
    remaining: list[int] = []  # remaining capacity per local bin
    assigned = []
    for tok in pdf["n_tok"].astype(int):
        for b, room in enumerate(remaining):
            if tok <= room:
                remaining[b] = room - tok
                assigned.append(b)
                break
        else:
            remaining.append(max(cap - tok, 0))
            assigned.append(len(remaining) - 1)
    return pd.DataFrame({
        "doc_id": pdf["doc_id"].astype("int64"),
        "n_tok": pdf["n_tok"].astype("int64"),
        "shard": shard,
        "bin_id": [(shard << 32) | b for b in assigned],
    })


def pack_by_counts(counts: DataFrame, max_tokens: int = 256,
                   n_shards: int = 64) -> DataFrame:
    """(doc_id, n_tok, shard, bin_id) over an explicit (doc_id, n_tok)
    frame — the generalized packer: callers with REAL token counts (a
    trained tokenizer's ``bpe_encode_ids``, r14) and the heuristic
    path share one FFD/sharding implementation, so bin semantics can
    never diverge between them."""
    slim = counts.select(
        "doc_id",
        F.coalesce(F.col("n_tok").cast("long"), F.lit(0)).alias("n_tok"),
        (F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)))
        .cast("int").alias("shard"),
        F.lit(max_tokens).alias("cap"),
    )
    return slim.groupBy("shard").applyInPandas(_pack_shard, PACK_SCHEMA)


def pack_sequences(documents: DataFrame, max_tokens: int = 256,
                   n_shards: int = 64) -> DataFrame:
    """(doc_id, n_tok, shard, bin_id): every document assigned to exactly
    one packing bin of budget ``max_tokens``. Counts come from the
    JVM-side ``bpe_ish_token_count`` heuristic (null text — dirty data
    — packs as a zero-token doc); pipelines with a trained tokenizer
    pack id sequences through ``pack_by_counts`` on real counts
    instead."""
    return pack_by_counts(
        documents.select(
            "doc_id",
            bpe_ish_token_count(F.col("text")).alias("n_tok")),
        max_tokens, n_shards)


def packing_stats(documents: DataFrame, max_tokens: int = 256,
                  n_shards: int = 64) -> DataFrame:
    """Corpus-level packing report: bins, fill factor, waste — the
    numbers a dataloader capacity plan needs. (Greedy FFD is not
    SQL-expressible, so this is invariant-tested in pytest rather than
    DuckDB-oracled.)"""
    packed = pack_sequences(documents, max_tokens, n_shards)
    bins = packed.groupBy("bin_id").agg(
        F.sum("n_tok").alias("fill"),
        F.count(F.lit(1)).alias("n_docs_in_bin"))
    # global agg: one row even on an empty corpus (sums coalesced so the
    # zero-docs report reads 0, not NULL)
    return bins.agg(
        F.coalesce(F.sum("n_docs_in_bin"), F.lit(0)).alias("n_docs"),
        F.count(F.lit(1)).alias("n_bins"),
        F.round(F.coalesce(F.avg("fill"), F.lit(0.0)) / max_tokens, 4)
        .alias("avg_fill_frac"),
        F.coalesce(F.max("fill"), F.lit(0)).alias("max_fill"),
        F.coalesce(F.sum(F.when(F.col("fill") > max_tokens, 1)
                         .otherwise(0)), F.lit(0))
        .alias("n_oversize_bins"),
    )
