"""Structured Streaming smoke tests (SURVEY.md §2c: streaming is declared
batch-first; the streaming twins must run and agree with the batch
results where semantics coincide)."""

from __future__ import annotations

from conftest import SF_DIR

from pyspark.sql import functions as F

from toymapreduce_go_spark.operators.events import events_tumbling
from toymapreduce_go_spark.sources.registry import load_table
from toymapreduce_go_spark.streaming.events_stream import (
    read_events_stream, run_to_memory, stream_events_tumbling,
    stream_sessionize)


def test_stream_tumbling_matches_batch(spark):
    """With the whole fixture drained in availableNow mode and complete
    output, the streaming tumbling agg equals the batch one (no late data
    is dropped because nothing is later than the final watermark)."""
    stream = read_events_stream(spark, SF_DIR)
    run_to_memory(stream_events_tumbling(stream), "t_tumbling", spark)
    got = {
        (r.window_start, r.event_type, r.n_events, r.sum_value)
        for r in spark.table("t_tumbling").collect()
    }
    want = {
        (r.window_start, r.event_type, r.n_events, r.sum_value)
        for r in events_tumbling(load_table(spark, SF_DIR, "events")).collect()
    }
    assert got == want


def test_stream_sessionize_runs(spark):
    """session_window streaming smoke: runs, produces sessions, per-user
    event counts sum to the table's rows."""
    stream = read_events_stream(spark, SF_DIR)
    run_to_memory(stream_sessionize(stream), "t_sessions", spark)
    out = spark.table("t_sessions")
    assert out.count() > 0
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == load_table(spark, SF_DIR, "events").count()
    # session invariant: end - start never exceeds ... (gap merges), and
    # every session has >= 1 event
    assert out.filter(F.col("n_events") < 1).count() == 0


def test_stream_sliding_matches_batch(spark):
    """Streaming sliding-window twin equals the batch form when the whole
    fixture is drained (complete mode, nothing beyond the watermark)."""
    from toymapreduce_go_spark.operators.events import events_sliding
    from toymapreduce_go_spark.streaming.events_stream import (
        stream_events_sliding)

    stream = read_events_stream(spark, SF_DIR)
    run_to_memory(stream_events_sliding(stream), "t_sliding", spark)
    got = {
        (r.window_start, r.event_type, r.n_events, r.sum_value)
        for r in spark.table("t_sliding").collect()
    }
    want = {
        (r.window_start, r.event_type, r.n_events, r.sum_value)
        for r in events_sliding(load_table(spark, SF_DIR, "events")).collect()
    }
    assert got == want


def test_stream_stateful_user_stats_matches_batch(spark):
    """applyInPandasWithState smoke: drain the fixture, keep each user's
    LAST emitted row (update mode re-emits on every touching batch) —
    must equal the batch groupBy aggregate."""
    from toymapreduce_go_spark.streaming.events_stream import (
        stream_user_running_stats)

    stream = read_events_stream(spark, SF_DIR)
    run_to_memory(stream_user_running_stats(stream), "t_user_stats", spark,
                  output_mode="update")
    emitted = spark.table("t_user_stats").toPandas()
    # update mode appends one row per (batch, user); the final state is
    # the max-n_events row per user
    last = emitted.sort_values("n_events").groupby("user_id").tail(1)
    got = {(int(r.user_id), int(r.n_events), round(float(r.sum_value), 2))
           for r in last.itertuples()}
    ev = load_table(spark, SF_DIR, "events")
    want = {(r.user_id, r.n, round(r.s, 2)) for r in
            ev.groupBy("user_id")
              .agg(F.count("*").alias("n"),
                   F.round(F.sum("value"), 2).alias("s")).collect()}
    assert got == want


def test_stream_exact_dedup_matches_batch_survivor_count(spark):
    """Streaming dropDuplicatesWithinWatermark on sha2(text) must keep
    exactly one row per distinct content hash — the batch distinct count
    is the oracle (all fixture rows arrive within one watermark)."""
    from toymapreduce_go_spark.streaming.events_stream import (
        read_documents_stream, run_to_memory, stream_exact_dedup)
    from toymapreduce_go_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    deduped = stream_exact_dedup(read_documents_stream(spark, SF_DIR))
    run_to_memory(deduped, "stream_dedup", spark, output_mode="append")
    got = spark.table("stream_dedup").count()
    expected = (load_table(spark, SF_DIR, "documents")
                .select(F.sha2("text", 256)).distinct().count())
    assert got == expected and got > 0


def test_stream_stream_interval_join_matches_batch(spark):
    """The watermarked stream-stream interval join (click → purchase
    within 1h per user) must equal the identical batch join once the
    whole fixture is drained: availableNow + append emits every pair
    whose match window the final watermark has closed, and nothing in a
    single-batch drain is late enough to be dropped."""
    from toymapreduce_go_spark.streaming.events_stream import (
        read_events_stream, run_to_memory, stream_click_purchase_join)

    stream = read_events_stream(spark, SF_DIR)
    run_to_memory(stream_click_purchase_join(stream), "t_funnel", spark,
                  output_mode="append")
    got = {(r.user_id, r.click_id, r.purchase_id)
           for r in spark.table("t_funnel").collect()}

    ev = load_table(spark, SF_DIR, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("cu"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("cts")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("pu"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("pts")))
    want = {(r.cu, r.click_id, r.purchase_id)
            for r in clicks.join(
                purchases,
                (F.col("cu") == F.col("pu"))
                & (F.col("pts") >= F.col("cts"))
                & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 hour"))
            ).collect()}
    assert got == want and len(got) > 0


def test_stream_interval_join_checkpoint_restart_exactly_once(
        spark, tmp_path):
    """Round-7: the restart guarantee, proven for the stateful
    stream-stream interval join (r6 verdict #8 — the dedup restart test
    below doesn't cover join state). Events are split at the median
    event time; run 1 drains the early half, run 2 (same checkpoint)
    the late half. Clicks from run 1 whose 1-hour match window is still
    open MUST meet run-2 purchases — that only works if the join's
    buffered state survives the restart — and the union of both runs'
    append-mode output must equal the batch join exactly: no pair lost,
    none emitted twice."""
    import shutil

    from toymapreduce_go_spark.streaming.events_stream import (
        stream_click_purchase_join)

    ev = load_table(spark, SF_DIR, "events")
    # Split point: the purchase time of a real matched pair whose click
    # strictly precedes it — guarantees at least one pair straddles the
    # restart (click in run 1, purchase in run 2). The median of those
    # candidate purchase times keeps the halves balanced, and splitting
    # in TIME order means run 2 never delivers events behind run 1's
    # watermark.
    cand = (ev.filter(F.col("event_type") == "click").alias("c")
            .join(ev.filter(F.col("event_type") == "purchase").alias("p"),
                  (F.col("c.user_id") == F.col("p.user_id"))
                  & (F.col("p.ts") > F.col("c.ts"))
                  & (F.col("p.ts") <= F.col("c.ts")
                     + F.expr("INTERVAL 1 hour")))
            .select(F.col("p.ts").alias("pts")).orderBy("pts").collect())
    assert cand, "fixture has no strictly-ordered click->purchase pair"
    median_ts = cand[len(cand) // 2].pts
    staged = tmp_path / "staged"
    ev.filter(F.col("ts") < F.lit(median_ts)) \
        .coalesce(1).write.parquet(str(staged / "early"))
    ev.filter(F.col("ts") >= F.lit(median_ts)) \
        .coalesce(1).write.parquet(str(staged / "late"))
    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(str(staged / "early")).schema

    def drain():
        q = (stream_click_purchase_join(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(str(src)))
             .writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        if q.isActive:
            q.stop()

    for p in sorted((staged / "early").glob("part-*")):
        shutil.copy(p, src / p.name)
    drain()
    n_first = spark.read.parquet(sink).count()
    for p in sorted((staged / "late").glob("part-*")):
        shutil.copy(p, src / p.name)
    drain()

    got = {(r.user_id, r.click_id, r.purchase_id)
           for r in spark.read.parquet(sink).collect()}
    out_rows = spark.read.parquet(sink).count()
    assert len(got) == out_rows  # no pair emitted twice
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("cu"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("cts")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("pu"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("pts")))
    want = {(r.cu, r.click_id, r.purchase_id)
            for r in clicks.join(
                purchases,
                (F.col("cu") == F.col("pu"))
                & (F.col("pts") >= F.col("cts"))
                & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 hour"))
            ).collect()}
    assert got == want and len(got) > 0
    assert n_first < len(want)  # run 1 really was partial
    # and some pair genuinely straddled the restart: click in run 1,
    # purchase in run 2 — the state-carry the test exists to prove
    straddling = {(r.cu, r.click_id, r.purchase_id)
                  for r in clicks.filter(F.col("cts") < F.lit(median_ts))
                  .join(purchases.filter(F.col("pts") >= F.lit(median_ts)),
                        (F.col("cu") == F.col("pu"))
                        & (F.col("pts") >= F.col("cts"))
                        & (F.col("pts") <= F.col("cts")
                           + F.expr("INTERVAL 1 hour"))).collect()}
    assert straddling and straddling <= got


def test_stream_checkpoint_restart_exactly_once(spark, tmp_path):
    """Operational property a 100 TB/day ingest depends on: a
    checkpointed streaming dedup picks up where it left off. Run 1
    drains two files; two more land; run 2 with the SAME checkpoint
    processes only the new arrivals, and the union of both runs'
    (append-mode, file-sink) output equals the batch dedup of all four
    files — no row lost, no row emitted twice, dedup state carried
    across the restart."""
    import shutil

    from toymapreduce_go_spark.streaming.events_stream import (
        stream_exact_dedup)
    from toymapreduce_go_spark.sources.registry import load_table

    docs = load_table(spark, SF_DIR, "documents")
    staged = tmp_path / "staged"
    docs.repartition(4).write.parquet(str(staged / "all"))
    parts = sorted((staged / "all").glob("part-*"))
    assert len(parts) == 4
    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(str(staged / "all")).schema

    def drain():
        q = (stream_exact_dedup(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(str(src)))
             .writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        if q.isActive:
            q.stop()

    for p in parts[:2]:
        shutil.copy(p, src / p.name)
    drain()
    n_first = spark.read.parquet(sink).count()
    for p in parts[2:]:
        shutil.copy(p, src / p.name)
    drain()

    out = spark.read.parquet(sink)
    n_batch_distinct = docs.select(F.sha2("text", 256)).distinct().count()
    assert out.count() == n_batch_distinct
    assert out.groupBy("fp").count().filter(F.col("count") > 1).count() == 0
    assert 0 < n_first < n_batch_distinct  # run 1 really was partial


def test_stream_static_enrichment_join_matches_batch(spark):
    """Stream-static join (the broadcast-enrichment pattern: a streaming
    fact joined to a static dim each micro-batch): documents stream
    enriched with a static per-lang dim must produce exactly the batch
    join's row multiset."""
    from toymapreduce_go_spark.streaming.events_stream import (
        read_documents_stream, run_to_memory)

    docs_batch = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lang_dim = (docs_batch.groupBy("lang")
                .agg(F.count(F.lit(1)).alias("n_lang_docs")))
    stream = read_documents_stream(spark, SF_DIR, n_splits=2)
    enriched = (stream.join(lang_dim, "lang")
                .select("doc_id", "lang", "n_lang_docs"))
    run_to_memory(enriched, "t_enriched", spark,
                  output_mode="append")
    got = spark.table("t_enriched")
    want = (docs_batch.join(lang_dim, "lang")
            .select("doc_id", "lang", "n_lang_docs"))
    assert got.count() == want.count()
    assert sorted((r["doc_id"], r["n_lang_docs"]) for r in got.collect()) \
        == sorted((r["doc_id"], r["n_lang_docs"]) for r in want.collect())


def test_quality_monitor_batches_and_replay(spark, tmp_path):
    """Streaming curation telemetry: one row per arrival batch whose
    totals equal the batch recomputation, idempotent under replay, and
    drift is visible (a poisoned batch shows a lower pass rate)."""
    import pyspark.sql.functions as F

    from toymapreduce_go_spark.operators.quality_model import gate_labels
    from toymapreduce_go_spark.streaming.events_stream import (
        read_documents_stream)
    from toymapreduce_go_spark.streaming.quality_stream import (
        quality_batch_step, read_telemetry, run_quality_monitor)

    state = str(tmp_path / "qmon")
    stream = read_documents_stream(spark, SF_DIR, n_splits=3)
    run_quality_monitor(stream, state, spark)
    tel = read_telemetry(spark, state)
    rows = {r["batch_id"]: r for r in tel.collect()}
    assert len(rows) >= 2  # multi-batch arrival really happened
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    total_pass = (gate_labels(docs).agg(F.sum("label")).collect()[0][0])
    assert sum(r["n_pass"] for r in rows.values()) == int(total_pass)
    assert sum(r["n_docs"] for r in rows.values()) == docs.count()
    # replay: re-running with no new input changes nothing
    run_quality_monitor(read_documents_stream(spark, SF_DIR, n_splits=3),
                        state, spark)
    again = {r["batch_id"]: tuple(r) for r in
             read_telemetry(spark, state).collect()}
    assert again == {r["batch_id"]: tuple(r) for r in rows.values()}
    # drift visibility: a poisoned batch (all-gibberish short docs)
    # reports a pass rate below every healthy batch's
    bad = spark.createDataFrame(
        [(10_000 + i, "spam", "zz!!") for i in range(50)],
        "doc_id long, source string, text string")
    quality_batch_step(spark, bad, 99, state)
    tel2 = {r["batch_id"]: r for r in
            read_telemetry(spark, state).collect()}
    assert tel2[99]["pass_rate"] == 0.0
    assert all(tel2[99]["pass_rate"] <= r["pass_rate"]
               for b, r in tel2.items() if b != 99)
