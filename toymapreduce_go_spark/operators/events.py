"""Event-time operators over the ``events`` table, batch-first (SURVEY.md
§2d #11-12). The Structured Streaming variants live in
``toymapreduce_go_spark.streaming``; these batch forms carry the
correctness weight because DuckDB can oracle them.

Scale: both operators shuffle once on (window/user) keys. At 100 TB the
events table would be date-partitioned Parquet, so the time filter prunes
partitions before any read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.checksum import CKSUM_MOD

SESSION_GAP_MINUTES = 30


def events_tumbling(events: DataFrame) -> DataFrame:
    """1-hour tumbling window aggregation: event count, distinct users,
    summed value per (hour, event_type).

    Uses Spark's ``window()`` (epoch-aligned, so ``window.start`` equals
    ``date_trunc('hour', ts)`` — the DuckDB oracle's form).
    """
    return (
        events
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "n_users", "sum_value")
        .orderBy("window_start", "event_type")
    )


def events_sessionize(events: DataFrame,
                      gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes``. Classic lag → boundary flag →
    cumulative-sum session id; one shuffle on user_id, all computation
    within the per-user window (no second shuffle — both window specs and
    the final groupBy share the user_id partitioning).

    Output: one row per session with bounds and event count.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer µs math, matching the oracle's epoch_us exactly —
    # unix_timestamp truncates to seconds, which flips sessions whose
    # gap straddles the boundary by <1s
    gap_us = gap_minutes * 60 * 1_000_000
    sessions = (
        events.select("user_id", "ts", "event_id", "value")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_ts").isNull()
                # cast defends against an un-normalized TIMESTAMP_NTZ input
                # (no-op on TIMESTAMP; session tz is pinned UTC)
                | ((F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.col("prev_ts").cast("timestamp"))) > gap_us),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("session_id", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


def events_sliding(events: DataFrame) -> DataFrame:
    """1-hour window sliding every 30 minutes: each event lands in exactly
    two windows (Spark's ``window(ts, '1 hour', '30 minutes')`` expands
    rows before the agg — same Expand-then-shuffle shape as rollup).
    Epoch-aligned starts, so the DuckDB oracle can reconstruct the two
    containing windows arithmetically."""
    return (
        events
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"),
                 "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
        .orderBy("window_start", "event_type")
    )


def events_gapfill(events: DataFrame) -> DataFrame:
    """Hypertable-style resample + gap-fill: a DENSE hourly grid per
    event_type over that type's [min, max] hour range, zero-filling
    missing hours' counts and carrying the last observed hourly average
    value forward (`locf`). The operation time-series stores call
    ``time_bucket_gapfill``; here it is sequence+explode for the grid,
    a left join onto the hourly rollup, and one `last(ignorenulls)`
    window for the fill.

    Scale: the grid is |event_types| × hours — metadata-sized next to
    the events themselves — and the only data-sized work is the hourly
    rollup's single shuffle. The fill window partitions by event_type,
    ordered by hour: one more shuffle of grid-sized (not event-sized)
    rows."""
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = (events.select(F.col("event_type"), hour.alias("h"),
                            F.col("value"))
              .groupBy("event_type", "h")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.round(F.avg("value"), 4).alias("avg_v")))
    bounds = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"))
    w = (Window.partitionBy("event_type").orderBy("h")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        grid.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type", F.col("h").alias("hour"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.last("avg_v", ignorenulls=True).over(w).alias("filled_avg_v"),
        )
        .orderBy("event_type", "hour")
    )


FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WITHIN_MINUTES = 24 * 60


def event_funnel(events: DataFrame,
                 steps: tuple[str, ...] = FUNNEL_STEPS,
                 within_minutes: int = FUNNEL_WITHIN_MINUTES) -> DataFrame:
    """Ordered-sequence funnel (the MATCH_RECOGNIZE-class analytics the
    events family was missing): per user, greedily match the earliest
    ``steps[0]`` event, then the earliest ``steps[1]`` STRICTLY after
    it, and so on — all later steps inside ``within_minutes`` of the
    first step's timestamp.

    Semantics — FIRST-TOUCH anchoring, stated precisely: the horizon
    is anchored on the user's EARLIEST step-1 event (the standard
    first-touch-attribution funnel). Without a binding horizon,
    greedy-earliest is exact for subsequence matching (a user
    completes iff the greedy chain does); WITH a binding horizon, a
    user whose only completing chain starts from a LATER step-1 event
    is deliberately not counted — that is the first-touch definition,
    not an approximation of the sliding ("any-anchor") variant, and
    the test suite pins it (test_funnel_first_touch_anchor).

    Output: one row per step — (step, event_type, n_users,
    t_checksum) — where n_users counts users whose chain reached the
    step and t_checksum folds each reached user's matched timestamp
    (µs mod a prime; bounded far from int64 at any user count) into
    the value-hash, so the oracle comparison pins the exact matched
    TIMES, not just the conversion counts.

    Scale — why a chain of min-aggs and not one collect_list: the
    single-shuffle alternative (sort each user's full event history
    into an array, scan it with ``aggregate``) materializes whale
    users' entire histories in one task — the per-key skew SURVEY.md
    §4 warns about. This plan instead runs len(steps) keyed equi-joins
    on user_id, each against a ≤-one-row-per-user frame, with
    map-side-combinable min aggregates on both sides of every join —
    no step ever holds more than (user, t, deadline) state, a hot user
    costs only their event count in the filtered scan, and the
    time-horizon filter prunes BEFORE each aggregation. At 100 TB the
    events table is date-partitioned, so the horizon also prunes
    whole partitions of the later-step scans."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    within_us = within_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = events.select("user_id", "event_type", us.alias("us"))
    cur = (base.filter(F.col("event_type") == steps[0])
           .groupBy("user_id").agg(F.min("us").alias("t")))
    cur = cur.withColumn("deadline", F.col("t") + F.lit(within_us))
    per_step = [cur]
    for s in steps[1:]:
        cur = (base.filter(F.col("event_type") == s)
               .join(per_step[-1].select("user_id", F.col("t").alias("prev_t"),
                                         "deadline"), "user_id")
               .filter((F.col("us") > F.col("prev_t"))
                       & (F.col("us") <= F.col("deadline")))
               .groupBy("user_id")
               .agg(F.min("us").alias("t"),
                    F.max("deadline").alias("deadline")))
        per_step.append(cur)
    rows = None
    for i, (s, frame) in enumerate(zip(steps, per_step)):
        agg = (frame.agg(
            F.count(F.lit(1)).alias("n_users"),
            F.coalesce(F.sum(F.pmod(F.col("t"), F.lit(CKSUM_MOD))),
                       F.lit(0)).alias("t_checksum"))
            .select(F.lit(i + 1).alias("step"),
                    F.lit(s).alias("event_type"), "n_users",
                    F.col("t_checksum").cast("long")))
        rows = agg if rows is None else rows.unionByName(agg)
    return rows.orderBy("step")


def user_retention(events: DataFrame) -> DataFrame:
    """Cohort retention (the funnel's classic companion): users are
    cohorted by the ISO week of their FIRST event; for every
    (cohort_week, week_offset) the output counts how many of that
    cohort were active ``week_offset`` weeks later.

    Exactness: ``date_trunc('week')`` is ISO-Monday in both engines,
    week offsets are integer day differences divided by 7 (weeks
    always differ by exact multiples of 7 days — no DST in NTZ
    timestamps), so the whole result is integer/timestamp-exact for
    the DuckDB value-hash.

    Scale: (user, week) distinct activity is ONE map-side-combinable
    dedup whose per-user fan-out is bounded by the calendar (a whale
    user still contributes at most |weeks| rows downstream); the
    cohort table is a min-agg per user; one keyed equi-join on
    user_id; the final rollup's key space is |weeks|² — metadata. No
    windows, no per-user history collection."""
    wk = F.date_trunc("week", F.col("ts"))
    day = F.date_trunc("day", F.col("ts"))
    activity = events.select("user_id", wk.alias("week"),
                             day.alias("day")).distinct()
    cohort = activity.groupBy("user_id").agg(
        F.min("week").alias("cohort_week"))
    return (activity.join(cohort, "user_id")
            .select("user_id", "day", "cohort_week",
                    (F.datediff(F.col("week"), F.col("cohort_week"))
                     / F.lit(7)).cast("long").alias("week_offset"))
            .groupBy("cohort_week", "week_offset")
            .agg(F.count_distinct("user_id").alias("n_users"),
                 F.count_distinct("user_id", "day").alias("n_active_days"))
            .orderBy("cohort_week", "week_offset"))


def event_anomalies(events: DataFrame) -> DataFrame:
    """Time-series anomaly report: per event_type, how many hours had
    a count beyond 2σ / 3σ of that type's own hourly distribution —
    the monitoring query every ingest pipeline runs over its event
    stream ("did some hour spike or die?").

    The σ-test is INTEGER-EXACT, which is what makes it value-hash
    oracleable: z² > k² is evaluated as the cross-multiplied
    inequality (n·c − s)² > k²·(n·ss − s²) over the integer moments
    (n hours, s = Σc, ss = Σc²) — no float mean/stddev ever computed,
    so both engines agree bit-for-bit even at the knife-edge
    (two-sided: dips count like spikes). Bounds: hourly counts c fit
    comfortably in int64 cross-products at any realistic per-type
    hourly volume (overflow needs n·c ≈ 3·10⁹).

    Scale: ONE count-combinable shuffle on (event_type, hour) — the
    events_tumbling shape — then a metadata-sized moment table
    broadcast back onto the hourly rows; the anomaly flags are a
    scan-side projection over |types|×|hours| rows. The
    anomaly_checksum folds the 3σ-anomalous hours' epoch-µs (mod the
    shared prime) into the value-hash so WHICH hours flagged is
    pinned, not just how many."""
    hr = F.date_trunc("hour", F.col("ts"))
    hourly = (events.groupBy("event_type", hr.alias("hr"))
              .agg(F.count(F.lit(1)).alias("c")))
    mom = (hourly.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("c").alias("s"),
                F.sum(F.col("c") * F.col("c")).alias("ss")))
    from pyspark.sql.functions import broadcast
    j = hourly.join(broadcast(mom), "event_type")
    dev2 = ((F.col("n") * F.col("c") - F.col("s"))
            * (F.col("n") * F.col("c") - F.col("s")))
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    z2 = dev2 > 4 * var_n2
    z3 = dev2 > 9 * var_n2
    return (j.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_hours"),
                 F.sum("c").alias("sum_events"),
                 F.sum(z2.cast("long")).alias("n_anomalies_2s"),
                 F.sum(z3.cast("long")).alias("n_anomalies_3s"),
                 F.sum(F.when(z3, F.pmod(
                     F.unix_micros(F.col("hr").cast("timestamp")),
                     F.lit(CKSUM_MOD))).otherwise(F.lit(0)))
                 .cast("long").alias("anomaly_checksum"))
            .orderBy("event_type"))
