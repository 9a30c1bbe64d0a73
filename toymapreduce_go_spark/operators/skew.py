"""Skew-handling utilities — the mechanism the reference entirely lacks
(SURVEY.md §4: "one hot key = one slow reduce group").

Two layers of defense at 100 TB:

1. AQE skew-join splitting (on by default in our session config) handles
   skew Spark can *see* at shuffle time.
2. Salting (here) handles aggregation skew AQE can't split: a hot
   grouping key is spread over ``n_salts`` sub-keys, partially
   aggregated, then re-aggregated — two small shuffles instead of one
   degenerate reducer.

``salted_agg`` works for any algebraic aggregate (sum/count/min/max);
the declared surface uses it implicitly through Catalyst's partial aggs,
so this module's role is the *explicit* escape hatch plus the salted
broadcast-join for hot join keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key: str, n_salts: int = 32) -> DataFrame:
    """groupBy(key).count() with a salt stage: safe even if one key holds
    half the table. Salt is derived from a stable hash of the full row's
    partition id + a cheap column hash — deterministic output either way
    because counts are algebraic."""
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id()
                                            + F.crc32(F.col(key).cast("string")),
                                            F.lit(n_salts)))
    partial = salted.groupBy(key, "__salt").agg(F.count("*").alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias("cnt"))


def salted_sum(df: DataFrame, key: str, value: str | Column,
               n_salts: int = 32) -> DataFrame:
    val = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id(),
                                            F.lit(n_salts)))
    partial = salted.groupBy(key, "__salt").agg(F.sum(val).alias("__s"))
    return partial.groupBy(key).agg(F.sum("__s").alias("sum_value"))


def replicated_skew_join(fact: DataFrame, dim: DataFrame, key: str,
                         n_salts: int = 16) -> DataFrame:
    """Shuffle-join a fact table with heavy key skew against a
    non-broadcastable dim: salt the fact side, replicate the dim side
    ``n_salts``× with an exploded salt column, join on (key, salt). Each
    hot key's rows land on ``n_salts`` reducers instead of one.

    (When the dim *is* broadcastable, just broadcast — this is for the
    middle regime, and AQE's skew-join handles most of it automatically;
    kept explicit for plan control at the extreme.)"""
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return salted_fact.join(replicated_dim, [key, "__salt"]).drop("__salt")
