"""Bucketed co-located joins: the physical plan must contain no shuffle.

The point of sources/bucketing.py is that a join between two tables
bucketed on the join key reads buckets back co-located — if an Exchange
shows up in the plan, bucketing silently didn't take (wrong key, wrong
count, or a path write that dropped the metadata) and at 100 TB the
query re-shuffles the fact table every run.

Broadcast is disabled around the join asserts: at test scale Catalyst
would happily broadcast the 60k-row 'fact' table, but the plan under
test is the fact-to-fact sort-merge join a 100 TB run would be forced
into — bucketing exists precisely for joins too big to broadcast."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from toymapreduce_go_spark.sources.bucketing import (
    colocated_join,
    write_bucketed,
)
from toymapreduce_go_spark.sources.registry import load_table


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@contextlib.contextmanager
def no_broadcast(spark):
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        yield
    finally:
        spark.conf.set(key, old)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_custkey")
    write_bucketed(li, "t_li_bucketed", "l_orderkey", 8)
    write_bucketed(orders, "t_orders_bucketed", "l_orderkey", 8)
    yield "t_li_bucketed", "t_orders_bucketed"
    for t in ("t_li_bucketed", "t_orders_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    with no_broadcast(spark):
        plan = plan_of(colocated_join(spark, left, right, "l_orderkey"))
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also satisfies its distribution
    from the bucketing — one scan-local HashAggregate, no shuffle."""
    left, _ = bucketed_tables
    agg = (spark.table(left).groupBy("l_orderkey")
           .agg(F.sum("l_extendedprice").alias("rev")))
    plan = plan_of(agg)
    assert "HashAggregate" in plan, plan
    assert "Exchange" not in plan, plan


def test_colocated_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    got = colocated_join(spark, left, right, "l_orderkey").count()
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert got == want


def test_mismatched_bucket_count_falls_back(spark, bucketed_tables):
    """Guard the failure mode the module docstring warns about: joining
    against a differently-bucketed table re-introduces an Exchange
    (Spark must re-shuffle at least one side)."""
    left, _ = bucketed_tables
    other = (load_table(spark, SF_DIR, "orders")
             .select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"))
    write_bucketed(other, "t_orders_b5", "l_orderkey", 5)
    try:
        with no_broadcast(spark):
            plan = plan_of(colocated_join(spark, left, "t_orders_b5",
                                          "l_orderkey"))
        assert "Exchange" in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b5")
