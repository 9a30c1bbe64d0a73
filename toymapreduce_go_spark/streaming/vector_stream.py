"""Streaming vector ingest — embeddings arrive in micro-batches and the
persisted IVF index (``operators.similarity.write_vector_index``
family) grows under ONE Structured Streaming checkpoint, completing
the vector-search lifecycle: build once, EXTEND per arrival batch,
probe many.

Contract per batch (the dedup stream's exactly-once conventions):

- the first non-empty batch TRAINS the coarse quantizer and builds the
  index, stamping its own ``ingest_batch`` partition id;
- every later batch assigns with the STORED centroids
  (``extend_vector_index`` — one scan-side argmax projection, cost
  independent of index size) and dynamic-overwrites only its own
  ``ingest_batch`` partition;
- a checkpoint replay of any batch therefore lands byte-identical: the
  building batch replays through the extend path (the model already
  exists, and extensions assign with the exact centroids the build
  trained), every extension replaces its own partition.

Reference scope: the reference has no streaming or vector surface at
all (SURVEY.md §2c); this is the north-star pipeline tier that keeps a
100 TB corpus's ANN index fresh as embeddings land, without ever
re-scanning the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import (NoVectorIndexModel,
                                    extend_vector_index,
                                    write_vector_index)
from .events_stream import read_table_stream
from .run import run_available_now

VINDEX_SUBDIR = "vindex"


def read_embeddings_stream(spark: SparkSession, sf_dir: str,
                           max_files_per_trigger: int = 1,
                           n_splits: int = 1) -> DataFrame:
    """File-source stream over the embeddings parquet (the shared
    ``read_table_stream`` plumbing)."""
    return read_table_stream(spark, sf_dir, "embeddings",
                             max_files_per_trigger, n_splits)


def read_recall_log(spark: SparkSession, state_dir: str) -> DataFrame:
    """(batch_id, hits, total, recall) — one row per ingested batch
    when the ingest runs with ``monitor_recall=True``."""
    return spark.read.parquet(f"{state_dir}/recall_log")


def read_rebuild_log(spark: SparkSession, state_dir: str) -> DataFrame:
    """(batch_id, recall_before, recall_after) — one row per batch
    whose monitored recall breached the rebuild floor and triggered an
    in-place ``rebuild_vector_index``."""
    return spark.read.parquet(f"{state_dir}/rebuild_log")


def _record_recall(spark: SparkSession, state_dir: str,
                   batch_id: int) -> float | None:
    """Compute the sampled brute-force recall floor over the index as
    it stands AFTER this batch and dynamic-overwrite this batch's own
    ``recall_log`` partition — deterministic given the (replayed)
    index state, so the monitor inherits the ingest's exactly-once
    contract. Skipped (returns None) while no postings exist yet
    (leading empty batches)."""
    from pyspark.errors import AnalysisException

    from ..operators.similarity import vector_index_recall
    idx = os.path.join(state_dir, VINDEX_SUBDIR)
    try:
        r = vector_index_recall(spark, idx)
    except AnalysisException:
        return None
    (spark.createDataFrame(
        [(batch_id, r["hits"], r["total"], float(r["recall"]))],
        "batch_id long, hits long, total long, recall double")
     .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id").parquet(f"{state_dir}/recall_log"))
    return float(r["recall"])


def _write_rebuild_row(spark: SparkSession, state_dir: str,
                       batch_id: int, before: float,
                       after: float | None) -> None:
    (spark.createDataFrame(
        [(batch_id, float(before),
          None if after is None else float(after))],
        "batch_id long, recall_before double, recall_after double")
     .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id").parquet(f"{state_dir}/rebuild_log"))


def _rebuild_on_drift(spark: SparkSession, state_dir: str,
                      batch_id: int, recall_before: float,
                      n_cells: int) -> None:
    """The monitor→rebuild policy arm (r11 verdict item 8), TWO-PHASE
    so the log survives a crash anywhere inside the rebuild window
    (review r12): phase A records (batch_id, recall_before, NULL) in
    this batch's own ``rebuild_log`` partition BEFORE the in-place
    rebuild mutates the index; phase B completes the row with the
    post-rebuild recall. A replayed batch whose crash fell AFTER the
    rebuild measures the rebuilt index (recall back above the floor,
    so the trigger doesn't re-fire) and HEALS the phase-A row instead
    (``_heal_rebuild_log``) — the drifted ``recall_before`` is never
    lost, and the index state itself is exactly-once because the
    rebuild is value-idempotent (rebuilt == fresh build is pinned)
    and crash-safe under the manifest-commit protocol. The one
    disclosed observability nuance: ``recall_log``'s row for the
    batch reflects the index as of its LAST evaluation, so a replay
    after the rebuild records the recovered recall there — the
    drifted value lives in ``rebuild_log.recall_before``."""
    from ..operators.similarity import (rebuild_vector_index,
                                        vector_index_recall)
    idx = os.path.join(state_dir, VINDEX_SUBDIR)
    _write_rebuild_row(spark, state_dir, batch_id, recall_before, None)
    rebuild_vector_index(spark, idx, n_cells=n_cells)
    after = vector_index_recall(spark, idx)
    _write_rebuild_row(spark, state_dir, batch_id, recall_before,
                       float(after["recall"]))


def _heal_rebuild_log(spark: SparkSession, state_dir: str,
                      batch_id: int, recall_now: float) -> None:
    """Complete a phase-A rebuild_log row left by a crash between the
    rebuild and its phase-B write: the replayed batch's measured
    recall IS the post-rebuild recall (same ``vector_index_recall``
    over the same rebuilt index)."""
    from pyspark.errors import AnalysisException

    from pyspark.sql import functions as F
    try:
        log = spark.read.parquet(f"{state_dir}/rebuild_log")
    except AnalysisException:
        return
    rows = log.filter(F.col("batch_id") == batch_id).collect()
    if rows and rows[0]["recall_after"] is None:
        _write_rebuild_row(spark, state_dir, batch_id,
                           float(rows[0]["recall_before"]), recall_now)


def vector_index_batch_step(batch_df: DataFrame, batch_id: int,
                            state_dir: str, n_cells: int = 8,
                            monitor_recall: bool = False,
                            rebuild_floor: float | None = None) -> None:
    """One ``foreachBatch`` step. Model present → extend (assign with
    stored centroids, overwrite own partition). Model absent → this is
    the first non-empty batch: train + build, owning its true
    partition id (see module docstring for why replay stays
    exactly-once either way). With ``rebuild_floor`` set (requires
    ``monitor_recall``), a batch whose monitored recall lands BELOW
    the floor triggers the in-place quantizer rebuild — the closed
    monitor→rebuild loop."""
    if rebuild_floor is not None and not monitor_recall:
        raise ValueError("rebuild_floor requires monitor_recall=True "
                         "(the policy reads the monitor's floor)")
    idx = os.path.join(state_dir, VINDEX_SUBDIR)
    batch = batch_df.select("vec_id", "embedding")
    try:
        extend_vector_index(batch, idx, batch_id=batch_id)
    except NoVectorIndexModel:
        # no model yet (all prior batches were empty, or this is batch
        # 0) — train on THIS batch; an empty batch writes an empty
        # model and the next non-empty one trains instead. The catch
        # is the DEDICATED sentinel, never bare ValueError: any other
        # error must surface, because falling into write_vector_index
        # (a full postings overwrite) with prior batches present would
        # silently retrain and wipe them all (advice r10)
        write_vector_index(batch, idx, n_cells=n_cells,
                           batch_id=batch_id)
    if monitor_recall:
        r = _record_recall(batch_df.sparkSession, state_dir, batch_id)
        if rebuild_floor is not None and r is not None:
            if r < rebuild_floor:
                _rebuild_on_drift(batch_df.sparkSession, state_dir,
                                  batch_id, r, n_cells)
            else:
                _heal_rebuild_log(batch_df.sparkSession, state_dir,
                                  batch_id, r)


def run_vector_ingest(embeddings_stream: DataFrame, state_dir: str,
                      n_cells: int = 8, timeout: int = 240,
                      monitor_recall: bool = False,
                      rebuild_floor: float | None = None):
    """Drive the vector ingest over all currently-available input
    (availableNow; production leaves the query running). The index
    lives at ``{state_dir}/vindex`` and is probed with
    ``similarity.ann_query_index`` exactly like a batch-built one.

    ``monitor_recall`` operationalizes the r11 drift monitor: after
    every batch, the sampled brute-force recall floor
    (``similarity.vector_index_recall``) lands in
    ``{state_dir}/recall_log`` partitioned by batch_id — the
    time-series an operator alerts on before scheduling
    ``rebuild_vector_index``. Opt-in: the floor costs one extra
    index scan per batch.

    ``rebuild_floor`` CLOSES that loop: any batch whose monitored
    recall lands below the floor retrains the quantizer in place
    (``_rebuild_on_drift``) and logs before/after recall to
    ``{state_dir}/rebuild_log`` — alert threshold → scheduled rebuild,
    as a tested policy instead of an operator runbook."""
    def step(batch_df: DataFrame, batch_id: int) -> None:
        vector_index_batch_step(batch_df, batch_id, state_dir,
                                n_cells=n_cells,
                                monitor_recall=monitor_recall,
                                rebuild_floor=rebuild_floor)

    return run_available_now(embeddings_stream, state_dir, step, timeout)
