"""Incremental (streaming) MinHash near-duplicate filtering.

The batch near-dup pipeline (``operators.dedup.near_dedup_minhash``)
answers "which pairs in THIS corpus are near-dups". A training-data
ingest pipeline needs the incremental form: documents arrive
continuously, and each batch must be filtered against *everything
accepted so far* — without ever re-scanning the historical corpus.

Design (the standard Bronze→Silver incremental-dedup shape):

- State is a **band-bucket index table**: one row per accepted
  (survivor) document per LSH band — ``(band_id, band_hash, doc_id)``,
  ~``n_bands`` × 16 bytes per survivor, stored as parquet partitioned by
  ``batch_id``. At 100 TB/day this is the only structure that scales:
  the historical corpus is never touched again, only its (much smaller)
  index, and the per-batch probe is a semi-join on (band_id, band_hash)
  — the same bucket-join shape as the batch pipeline's candidate step.
- Per micro-batch (``foreachBatch``): documents that share ANY band
  bucket with an accepted document are near-dups and are dropped;
  within the batch, the lowest doc_id per bucket survives (mirroring
  the batch pipeline's min-doc_id survivor rule). Survivors' band rows
  are appended to the index; survivors are appended to the output.
- **Exactly-once across restarts**: every write is a deterministic
  dynamic-partition overwrite of ``batch_id=<N>``, so a replayed batch
  (checkpoint restart re-delivers the last uncommitted batch) rewrites
  its own partitions byte-identically instead of duplicating them; the
  probe explicitly filters the index to ``batch_id < N`` so a replay
  never sees its own half-written state.

No reference parity to cite: the reference engine has no streaming at
all (SURVEY.md §2c); the *banding semantics* are the batch pipeline's
(``dedup.py``), which carries the oracle-checked correctness.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from toymapreduce_go_spark.operators.dedup import (N_BANDS, N_HASHES,
                                                   band_rows,
                                                   minhash_signatures)

_BANDS_SUBDIR = "bands"
_OUT_SUBDIR = "survivors"


def _batch_band_rows(batch_df: DataFrame, n: int, n_hashes: int,
                     n_bands: int) -> DataFrame:
    """(doc_id, band_id, band_hash) for one micro-batch — the exact
    production band key (xxhash64 over signature slices) from the batch
    pipeline, so batch and streaming tiers agree on what a near-dup is."""
    sig = minhash_signatures(batch_df, n=n, n_hashes=n_hashes)
    return band_rows(sig, n_hashes=n_hashes, n_bands=n_bands)


def near_dedup_batch_step(spark: SparkSession, batch_df: DataFrame,
                          batch_id: int, state_dir: str, n: int = 3,
                          n_hashes: int = N_HASHES,
                          n_bands: int = N_BANDS) -> None:
    """One ``foreachBatch`` step: probe the index, pick survivors, commit
    this batch's index + output partitions idempotently."""
    bands_path = os.path.join(state_dir, _BANDS_SUBDIR)
    out_path = os.path.join(state_dir, _OUT_SUBDIR)

    batch = batch_df.select("doc_id", "source", "text")
    bands = _batch_band_rows(batch, n, n_hashes, n_bands)

    # Probe the historical index. batch_id < N guards replay: a restarted
    # batch must not match the band rows it already half-committed.
    try:
        hist = (spark.read.parquet(bands_path)
                .filter(F.col("batch_id") < F.lit(batch_id))
                .select("band_id", "band_hash"))
        hist_dup_ids = (bands.join(hist, ["band_id", "band_hash"],
                                   "left_semi")
                        .select("doc_id").distinct())
    except Exception:  # first batch: no index yet
        hist_dup_ids = None

    fresh = bands if hist_dup_ids is None else bands.join(
        hist_dup_ids, "doc_id", "left_anti")

    # Within-batch survivor rule: lowest doc_id per bucket survives; any
    # doc sharing a bucket with a lower fresh doc_id is a near-dup of it
    # (same min-doc_id convention as the batch pipeline's skew cap).
    bucket_min = fresh.groupBy("band_id", "band_hash").agg(
        F.min("doc_id").alias("min_id"))
    intra_dup_ids = (fresh.join(bucket_min, ["band_id", "band_hash"])
                     .filter(F.col("doc_id") > F.col("min_id"))
                     .select("doc_id").distinct())
    survivor_bands = fresh.join(intra_dup_ids, "doc_id", "left_anti")

    # Idempotent commits: deterministic content per (batch partition),
    # dynamic-partition overwrite of ONLY batch_id=<N>.
    (survivor_bands.withColumn("batch_id", F.lit(batch_id))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id").parquet(bands_path))
    survivors = batch.join(
        survivor_bands.select("doc_id").distinct(), "doc_id", "left_semi")
    (survivors.select("doc_id", "source")
     .withColumn("batch_id", F.lit(batch_id))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id").parquet(out_path))


def run_near_dedup_stream(documents_stream: DataFrame, state_dir: str,
                          spark: SparkSession, n: int = 3,
                          n_hashes: int = N_HASHES,
                          n_bands: int = N_BANDS, timeout: int = 120):
    """Drive the incremental near-dedup to completion of available input
    (test/ops entry point; production would leave the query running).
    Returns after all currently-available files are processed."""
    ckpt = os.path.join(state_dir, "_checkpoint")

    def step(batch_df: DataFrame, batch_id: int) -> None:
        near_dedup_batch_step(spark, batch_df, batch_id, state_dir,
                              n=n, n_hashes=n_hashes, n_bands=n_bands)

    q = (documents_stream.writeStream
         .foreachBatch(step)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(timeout)
    return q


def read_survivors(spark: SparkSession, state_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(state_dir, _OUT_SUBDIR))
