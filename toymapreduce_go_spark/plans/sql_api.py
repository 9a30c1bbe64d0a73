"""SQL front door: run ANSI SQL over the engine's table catalog.

The reference's only "query language" is a compiled Go plugin pair
(`pkg/mr/mr.go:96-98`); this engine's primary surfaces are the DataFrame
operators and this SQL entry — a user points at a data directory and
queries the same ten tables the declared surface uses, with every
Catalyst optimization (pushdown, pruning, broadcast, AQE) applying
as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.registry import TABLES, load_table

_VIEW_PREFIX = "tmr"


def register_catalog(spark: SparkSession, sf_dir: str,
                     prefix: str = "") -> list[str]:
    """Register every catalog table as a temp view named
    ``<prefix><table>``; returns the view names. Views are lazy — no
    data is read until a query touches them, so registering all ten
    costs only a schema peek."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run one SQL statement against the catalog at ``sf_dir``.

    Table names in ``query`` are the bare catalog names (``lineitem``,
    ``documents``...). Example::

        sql(spark, "/data/sf100",
            "SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1")
    """
    register_catalog(spark, sf_dir)
    return spark.sql(query)
