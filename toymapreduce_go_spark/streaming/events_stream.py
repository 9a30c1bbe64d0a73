"""Structured Streaming variants of the event-time operators.

The batch forms in ``operators.events`` carry oracle-checked correctness;
these are the streaming twins (SURVEY.md §2c streaming row: declared
batch-first, streaming = smoke-tested). The reference has no streaming at
all — this is pure capability extension, expressed with Spark's native
watermark + window machinery:

- tumbling aggregation: ``withWatermark`` + ``window()`` — late events
  beyond the watermark are dropped, state is bounded;
- sessionization: ``session_window`` (gap-based, Spark 3.2+) — the
  streaming-native equivalent of the batch lag+cumsum form.

At 100 TB-scale streaming, the same code runs against Kafka by swapping
the source; state lives in the checkpointed state store and watermarks
bound it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.events import SESSION_GAP_MINUTES


def _stream_src_dir(spark: SparkSession, sf_dir: str, table: str,
                    n_splits: int = 1) -> str:
    """Deterministic per-(fixture, table, n_splits) staging directory for
    the file stream source (which requires a directory, while the fixture
    is a single read-only file). Reused across calls — no temp-dir leak.

    ``n_splits == 1``: symlink the fixture file in.
    ``n_splits > 1``: materialize the fixture as n parquet files so
    ``maxFilesPerTrigger=1`` genuinely exercises multi-batch arrival
    (a single symlinked file is always exactly one trigger).
    Production points at the real landing directory instead.
    """
    import hashlib
    import os
    import shutil
    import tempfile

    fixture_mtime = os.path.getmtime(
        os.path.abspath(f"{sf_dir}/{table}.parquet"))
    # Two-part name: a (fixture, table, splits) prefix plus an mtime
    # suffix. The mtime matters because the upstream fixtures have been
    # regenerated between rounds — a split cache keyed on path alone
    # would keep serving the old rows (and potentially an old schema)
    # forever. Splitting it out of the prefix lets us garbage-collect
    # the STALE mtime variants (r6 advice: keyed on mtime alone, every
    # regeneration leaked a full split copy into tempdir forever).
    base = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{table}|{n_splits}"
        .encode()).hexdigest()[:12]
    mkey = hashlib.md5(str(fixture_mtime).encode()).hexdigest()[:8]
    tmp = tempfile.gettempdir()
    src_dir = os.path.join(tmp, f"tmrs_stream_{base}_{mkey}")
    for stale in os.listdir(tmp):  # best-effort GC of old-mtime variants
        if stale.startswith(f"tmrs_stream_{base}_") \
                and stale != f"tmrs_stream_{base}_{mkey}":
            shutil.rmtree(os.path.join(tmp, stale), ignore_errors=True)
    fixture = os.path.abspath(f"{sf_dir}/{table}.parquet")
    if n_splits == 1:
        os.makedirs(src_dir, exist_ok=True)
        link = os.path.join(src_dir, f"{table}.parquet")
        if not os.path.exists(link):
            os.symlink(fixture, link)
    elif not os.path.isdir(src_dir) or not any(
            f.endswith(".parquet") for f in os.listdir(src_dir)):
        (spark.read.parquet(fixture).repartition(n_splits)
         .write.mode("overwrite").parquet(src_dir))
    return src_dir


def read_events_stream(spark: SparkSession, sf_dir: str,
                       max_files_per_trigger: int = 1,
                       n_splits: int = 1) -> DataFrame:
    """File-source stream over the events parquet (one file per trigger
    simulates arrival; pass ``n_splits > 1`` for true multi-batch
    arrival); schema comes from a batch peek of the same path.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src_dir = _stream_src_dir(spark, sf_dir, "events", n_splits)
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    # same event-time normalization as the batch source (ns-as-long and
    # TIMESTAMP_NTZ encodings both reject withWatermark otherwise)
    from ..sources.registry import normalize_event_time
    return normalize_event_time(stream)


def stream_events_tumbling(events_stream: DataFrame,
                           watermark: str = "2 hours") -> DataFrame:
    """Streaming 1-hour tumbling aggregation with watermarked state.
    Late events older than the watermark are dropped; window state is
    evicted once the watermark passes window end."""
    return (
        events_stream
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
    )


def stream_sessionize(events_stream: DataFrame,
                      gap_minutes: int = SESSION_GAP_MINUTES,
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming gap-based sessionization via ``session_window`` — state
    per (user, open session), merged when events arrive within the gap,
    emitted when the watermark closes the session."""
    return (
        events_stream
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("sw"),
                 "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select("user_id", F.col("sw.start").alias("session_start"),
                F.col("sw.end").alias("session_end"), "n_events", "sum_value")
    )


def run_to_memory(df: DataFrame, table_name: str, spark: SparkSession,
                  output_mode: str = "complete") -> None:
    """Drain the stream with availableNow into an in-memory sink (test/
    smoke harness; production uses kafka/delta sinks + checkpointing)."""
    q = (
        df.writeStream.format("memory").queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()


def stream_events_sliding(events_stream: DataFrame,
                          watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch sliding-window agg: 1-hour windows
    every 30 minutes. Each event updates two window states; the
    watermark evicts a window once it passes window end + slide."""
    return (
        events_stream
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"),
                 "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
    )


USER_STATS_OUTPUT = ("user_id long, n_events long, sum_value double, "
                     "max_value double")
USER_STATS_STATE = "n long, s double, mx double"


def _user_stats_fn(key, pdf_iter, state):
    """applyInPandasWithState body: fold this batch's rows for one user
    into (count, sum, max) state; emit the updated running totals.
    Lives at module level so cloudpickle ships it by value."""
    import pandas as pd

    (user_id,) = key
    n, s, mx = state.get() if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdf_iter:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, s, mx))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                        "sum_value": [round(s, 2)], "max_value": [mx]})


def stream_user_running_stats(events_stream: DataFrame,
                              watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` (the
    escape hatch when built-in windows can't express the state machine):
    per-user running (count, sum, max) maintained in the state store,
    re-emitted on every batch that touches the user.

    Scale: state is one tiny tuple per user partitioned by the shuffle
    key; Arrow batches flow per (partition, key-group). Real pipelines
    add a timeout (GroupStateTimeout) to expire idle users — omitted
    here so the smoke test's final emission equals the batch aggregate.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events_stream
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _user_stats_fn,
            outputStructType=USER_STATS_OUTPUT,
            stateStructType=USER_STATS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_click_purchase_join(events_stream: DataFrame,
                               horizon: str = "1 hour",
                               watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join — the funnel query: each click joined
    to the same user's purchases within ``horizon`` after it.

    This is the one streaming join shape that is safe unbounded: BOTH
    sides carry a watermark and the join condition brackets the right
    side's event time into [click_ts, click_ts + horizon], so Spark can
    prove when a buffered row can never match again and evict it — state
    is O(events within horizon + watermark), not O(stream). A
    stream-stream equi-join without the time bracket would buffer both
    streams forever; Spark rejects it in append mode for exactly that
    reason.

    At scale both sides shuffle on user_id once; the state store holds
    the in-horizon window per key. Same code against Kafka sources.
    """
    clicks = (events_stream
              .filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts"))
              .withWatermark("click_ts", watermark))
    purchases = (events_stream
                 .filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts"),
                         F.col("value").alias("purchase_value"))
                 .withWatermark("purchase_ts", watermark))
    return (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts")
               <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")))
        .select(F.col("c_user").alias("user_id"), "click_id", "click_ts",
                "purchase_id", "purchase_ts", "purchase_value")
    )


def read_table_stream(spark: SparkSession, sf_dir: str, table: str,
                      max_files_per_trigger: int = 1,
                      n_splits: int = 1) -> DataFrame:
    """Generic file-source stream over a fixture table (one file per
    trigger simulates arrival, ``n_splits > 1`` for true multi-batch
    arrival; production points at the landing directory). The shared
    plumbing behind the documents/embeddings readers — events keeps its
    own wrapper for the extra event-time normalization."""
    raw_schema = spark.read.parquet(f"{sf_dir}/{table}.parquet").schema
    src_dir = _stream_src_dir(spark, sf_dir, table, n_splits)
    return (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def read_documents_stream(spark: SparkSession, sf_dir: str,
                          max_files_per_trigger: int = 1,
                          n_splits: int = 1) -> DataFrame:
    """File-source stream over the documents parquet — the streaming face
    of the curation pipeline's input."""
    return read_table_stream(spark, sf_dir, "documents",
                             max_files_per_trigger, n_splits)


def stream_exact_dedup(documents_stream: DataFrame,
                       watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup — the streaming twin of
    ``operators.dedup.exact_dedup_survivors`` (reference has no streaming
    at all; batch form carries the oracle-checked correctness).

    ``dropDuplicatesWithinWatermark`` on the content fingerprint keeps
    one state-store entry per distinct sha256 *within the watermark
    horizon* — the state bound that makes streaming dedup viable at
    100 TB/day ingest (an unbounded ``dropDuplicates`` would grow state
    forever). Arrival time is stamped at ingest: content dedup has no
    event time of its own, and the horizon is an ops choice ("suppress
    re-crawls seen within N").
    """
    return (
        documents_stream
        .withColumn("fp", F.sha2(F.col("text"), 256))
        .withColumn("ingest_ts", F.current_timestamp())
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .select("doc_id", "source", "fp")
    )
