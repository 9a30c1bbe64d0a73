"""asof_join semantics beyond the declared query's single-value-col shape:
multiple value columns, NULLs in the matched right row, empty value_cols,
and inner (no-prior-match drop) behavior — the regressions VERDICT r01 #3
called out (leaked loop variable / per-column last(ignorenulls) drift).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from toymapreduce_go_spark.operators.joins import asof_join


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "l-a"), (1, _ts(30), "l-b"), (2, _ts(5), "l-c")],
        "k int, ts timestamp, lval string")
    # user 1: match at ts=9 has (v1=10, v2=NULL); an OLDER row at ts=1 has
    # non-null v2=99 — per-column last(ignorenulls) would wrongly splice
    # 99 into the ts=9 match. Second left row matches ts=25 (both set).
    right = spark.createDataFrame(
        [(1, _ts(1), 7, 99), (1, _ts(9), 10, None), (1, _ts(25), 20, 5)],
        "k int, ts timestamp, v1 int, v2 int")
    return left, right


def test_asof_multi_value_cols_all_from_matched_row(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", ts="ts",
                    value_cols=["v1", "v2"]).orderBy("ts")
    rows = out.collect()
    # left row at ts=5 (k=2) has no right side at all → dropped (inner)
    assert [r["lval"] for r in rows] == ["l-a", "l-b"]
    a, b = rows
    assert a["ts_asof"] == _ts(9)
    assert (a["v1_asof"], a["v2_asof"]) == (10, None)  # NULL survives
    assert b["ts_asof"] == _ts(25)
    assert (b["v1_asof"], b["v2_asof"]) == (20, 5)


def test_asof_empty_value_cols(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", ts="ts", value_cols=[])
    rows = out.orderBy("ts").collect()
    assert [r["ts_asof"] for r in rows] == [_ts(9), _ts(25)]
    assert set(out.columns) == {"k", "ts", "lval", "ts_asof"}


def test_asof_equal_ts_is_inclusive(spark):
    left = spark.createDataFrame([(1, _ts(9), "x")],
                                 "k int, ts timestamp, lval string")
    right = spark.createDataFrame([(1, _ts(9), 42, 1)],
                                  "k int, ts timestamp, v1 int, v2 int")
    rows = asof_join(left, right, on="k", ts="ts",
                     value_cols=["v1", "v2"]).collect()
    assert len(rows) == 1 and rows[0]["v1_asof"] == 42


def test_asof_duckdb_parity_with_nulls(spark, duck):
    """Differential check against DuckDB's native ASOF JOIN on a fixture
    with NULL value columns (the declared events_asof_join fixture has
    none, which is exactly how the r01 bug survived)."""
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", ts="ts",
                    value_cols=["v1", "v2"]).orderBy("ts")
    got = [(r["k"], r["ts"], r["lval"], r["ts_asof"], r["v1_asof"],
            r["v2_asof"]) for r in out.collect()]
    duck.execute("CREATE OR REPLACE TABLE _asof_l (k int, ts timestamp, lval varchar)")
    duck.execute("CREATE OR REPLACE TABLE _asof_r (k int, ts timestamp, v1 int, v2 int)")
    duck.executemany("INSERT INTO _asof_l VALUES (?, ?, ?)",
                     [tuple(r) for r in left.collect()])
    duck.executemany("INSERT INTO _asof_r VALUES (?, ?, ?, ?)",
                     [tuple(r) for r in right.collect()])
    want = duck.execute("""
        SELECT l.k, l.ts, l.lval, r.ts AS ts_asof, r.v1, r.v2
        FROM _asof_l l ASOF JOIN _asof_r r
          ON l.k = r.k AND l.ts >= r.ts
        ORDER BY l.ts
    """).fetchall()
    assert got == [tuple(w) for w in want]


def test_events_gapfill_grid_is_dense_and_filled(spark):
    """The resampled grid must have exactly one row per hour per type
    with no holes, zero counts on empty hours, and a forward-filled
    value from the first observation on."""
    import pyspark.sql.functions as F

    from conftest import SF_DIR
    from toymapreduce_go_spark.operators.events import events_gapfill
    from toymapreduce_go_spark.sources.registry import load_table

    out = events_gapfill(load_table(spark, SF_DIR, "events"))
    per_type = out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("rows"),
        F.min("hour").alias("h0"), F.max("hour").alias("h1"),
        F.sum((F.col("n_events") == 0).cast("int")).alias("zero_hours"),
        F.sum(F.col("filled_avg_v").isNull().cast("int")).alias("nulls"))
    for r in per_type.collect():
        expect = int((r["h1"] - r["h0"]).total_seconds() // 3600) + 1
        assert r["rows"] == expect, r
        # first grid hour has an observation (bounds come from data), so
        # the forward fill leaves no nulls anywhere
        assert r["nulls"] == 0, r


def test_fuzzy_pairs_planted_edit_cases(spark):
    """Deletion-neighborhood recall on hand-built cases: substitution,
    insertion, deletion at every position class (start/middle/end) are
    found at dist 1; exact duplicates at dist 0; a transposition
    (dist 2) shares deletion variants but must be filtered out; an
    unrelated name must not pair."""
    from toymapreduce_go_spark.operators.relational import fuzzy_name_pairs

    rows = [(1, "carlos"), (2, "karlos"),   # substitution @ start
            (3, "carlo"),                   # deletion @ end
            (4, "carblos"),                 # insertion @ middle
            (5, "acrlos"),                  # transposition → dist 2
            (6, "zelda"),                   # unrelated
            (7, "carlos")]                  # exact duplicate of 1
    cust = spark.createDataFrame(
        [(k, nm, "addr", 0, "p", 0.0, "seg", "c") for k, nm in rows],
        "c_custkey long, c_name string, c_address string, "
        "c_nationkey long, c_phone string, c_acctbal double, "
        "c_mktsegment string, c_comment string")
    got = {(r.custkey_a, r.custkey_b): r.dist
           for r in fuzzy_name_pairs(cust).collect()}
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(1, 4)] == 1
    assert got[(1, 7)] == 0
    assert (1, 5) not in got and (1, 6) not in got
    # the duplicate pairs with everything its twin pairs with
    assert got[(2, 7)] == 1 and got[(3, 7)] == 1 and got[(4, 7)] == 1
    assert set(got) == {(1, 2), (1, 3), (1, 4), (1, 7),
                        (2, 7), (3, 7), (4, 7)}


def test_fuzzy_join_plan_is_variant_equijoin(spark):
    """Plan contract: ONE equi-join on the deletion variant (never a
    cartesian/nested-loop distance predicate over row pairs), no
    window, no Python."""
    from test_explain_plans import plan_of

    from conftest import SF_DIR
    from toymapreduce_go_spark.operators.relational import fuzzy_name_stats
    from toymapreduce_go_spark.sources.registry import load_table

    cust = load_table(spark, SF_DIR, "customer")
    plan = plan_of(fuzzy_name_stats(cust))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" not in plan, plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_fuzzy_join_max_candidates_guard(spark):
    """Blowup guard rail: an adversarial key distribution (all names
    one substitution apart — every pair shares the same deletion
    variant, quadratic candidates by construction) trips the
    max_candidates pre-check LOUDLY before the join runs; a benign
    corpus under the cap returns the identical pair set."""
    import pytest

    from toymapreduce_go_spark.operators.relational import fuzzy_name_pairs

    def cust(rows):
        return spark.createDataFrame(
            [(k, nm, "addr", 0, "p", 0.0, "seg", "c") for k, nm in rows],
            "c_custkey long, c_name string, c_address string, "
            "c_nationkey long, c_phone string, c_acctbal double, "
            "c_mktsegment string, c_comment string")

    # 40 names "nameXX" differing only in the last 2 chars do NOT all
    # collide; use a truly hot variant: one fixed stem + one varying
    # character at the end -> deleting it maps all to the same variant.
    hot = cust([(i, f"aaaa{c}") for i, c in
                enumerate("abcdefghijklmnopqrstuvwxyz")])
    with pytest.raises(ValueError, match="max_candidates=100"):
        fuzzy_name_pairs(hot, max_candidates=100)

    benign = cust([(1, "carlos"), (2, "karlos"), (3, "zelda")])
    capped = {(r.custkey_a, r.custkey_b, r.dist)
              for r in fuzzy_name_pairs(benign,
                                        max_candidates=1000).collect()}
    uncapped = {(r.custkey_a, r.custkey_b, r.dist)
                for r in fuzzy_name_pairs(benign).collect()}
    assert capped == uncapped == {(1, 2, 1)}


def test_fuzzy_guard_counts_cross_key_rows_only(spark):
    """review r10: repeated-character names produce duplicate deletion
    variants for the SAME key; those row pairs never pass a.k < b.k,
    so they must not count against max_candidates. 'aaa'/'aab' share
    variant 'aa' with multiplicities 3/1 -> exactly 3 cross-key
    candidate rows (the old sum-C(m,2) said 7 and tripped a cap of 3)."""
    from toymapreduce_go_spark.operators.relational import fuzzy_name_pairs

    cust = spark.createDataFrame(
        [(1, "aaa", "a", 0, "p", 0.0, "s", "c"),
         (2, "aab", "a", 0, "p", 0.0, "s", "c")],
        "c_custkey long, c_name string, c_address string, "
        "c_nationkey long, c_phone string, c_acctbal double, "
        "c_mktsegment string, c_comment string")
    got = {(r.custkey_a, r.custkey_b, r.dist)
           for r in fuzzy_name_pairs(cust, max_candidates=3).collect()}
    assert got == {(1, 2, 1)}
