"""Join extensions beyond plain equi-joins (SURVEY.md §2c joins row:
semi/anti ship with Spark; range/as-of need composition).

``asof_join`` is the one that matters for time-series/feature pipelines:
for each left row, the most recent right row at-or-before its timestamp,
per key. The naive formulation (theta-join on ``l.ts >= r.ts`` + argmax)
is quadratic per key; this implementation is the scalable union+window
form:

    union(tagged left, tagged right)
      → one shuffle on (key)
      → last_value(right cols, ignorenulls) over (key ORDER BY ts, side)
      → keep left rows

One sort-shuffle total, no join explosion, no skew beyond what the key
distribution already has — the same plan shape Flink/kdb as-of joins
lower to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              value_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """For each ``left`` row: the latest ``right`` row with
    ``right.ts <= left.ts`` sharing ``on``. Inner semantics (left rows with
    no prior right row are dropped, matching DuckDB's ASOF JOIN).

    ``value_cols``: right columns carried over (suffixed). Right rows sort
    before left rows at equal ts, making the match inclusive (>=).
    """
    # All right-side payload travels in ONE struct (matched ts + every
    # value column), so a single last(ignorenulls) picks the whole matched
    # row atomically: value columns that are NULL *in the matched row*
    # stay NULL instead of falling back to an older right row, and match
    # detection is the struct's own nullity, independent of value_cols.
    rt = right.select(
        F.col(on), F.col(ts),
        F.lit(0).alias("__side"),
        F.struct(F.col(ts).alias("__rts"),
                 *[F.col(c) for c in value_cols]).alias("__rrow"),
    )
    lt = left.withColumn("__side", F.lit(1)).withColumn(
        "__rrow", F.lit(None).cast(rt.schema["__rrow"].dataType))
    ltypes = {f.name: f.dataType for f in lt.schema.fields}
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(ltypes[c]))

    w = (Window.partitionBy(on).orderBy(F.col(ts).asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = lt.unionByName(rt.select(*lt.columns)).withColumn(
        "__match", F.last("__rrow", ignorenulls=True).over(w))
    return (
        matched.filter((F.col("__side") == 1) & F.col("__match").isNotNull())
        .select(
            *left.columns,
            F.col("__match.__rts").alias(ts + suffix),
            *[F.col(f"__match.{c}").alias(c + suffix) for c in value_cols],
        )
    )


def events_asof_join(events: DataFrame) -> DataFrame:
    """Declared query: for each 'error' event, the same user's most recent
    'click' at-or-before it (classic session-attribution shape). Oracle:
    DuckDB's native ASOF JOIN."""
    errors = events.filter(F.col("event_type") == "error") \
                   .select("event_id", "user_id", "ts", "value")
    clicks = events.filter(F.col("event_type") == "click") \
                   .select("user_id", "ts", "value")
    joined = asof_join(errors, clicks, on="user_id", ts="ts",
                       value_cols=["value"])
    return (
        joined.select(
            "event_id", "user_id",
            F.round("value", 2).alias("err_value"),
            F.col("ts_asof").alias("prev_click_ts"),
            F.round("value_asof", 2).alias("prev_click_value"),
        )
        .orderBy("event_id")
    )
