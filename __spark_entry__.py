"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``toymapreduce_go_spark`` (see SURVEY.md §2d
for the declared-query inventory). 49 of the 50 declared queries carry a
DuckDB oracle; the one exception is ``approx_stats`` (HLL/t-digest
sketch internals are engine-specific) which gets the rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from toymapreduce_go_spark.plans.queries import (DECLARED, ORACLES, QUERIES,
                                                 entry_query)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary, TPC-H-Q1 shape) on sf0.001."""
    return entry_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Exactly 50 entries: the driver records at most 50 correctness rows
    # per round (see plans/queries.py DECLARED); the full QUERIES surface
    # is oracle-checked in tests/test_oracle_parity.py.
    return {name: QUERIES[name] for name in DECLARED}


def oracle_sql() -> dict[str, str]:
    return {name: ORACLES[name] for name in DECLARED if name in ORACLES}
