"""Vector math over ``array<float>`` embedding columns.

JVM-side higher-order functions (``zip_with`` / ``aggregate``) — no Python
in the hot path, no UDF serialization. Inputs are cast to double before
arithmetic so Spark and the DuckDB oracle accumulate at the same precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length numeric arrays."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(_as_double(a), lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


# SQL-text twins (r15): the Column builders above cost ~60 py4j round
# trips per call site; hot plan constructors (the similarity tiers)
# compose these text renderings and pay ONE F.expr parse. Node-for-node
# the same Catalyst trees, so values are bit-identical.

def dot_sql(a: str, b: str) -> str:
    """``dot`` as SQL text over input expressions (themselves SQL)."""
    return (f"aggregate(zip_with(transform({a}, x -> double(x)), "
            f"transform({b}, x -> double(x)), (x, y) -> x * y), "
            f"0D, (acc, x) -> acc + x)")


def l2_norm_sql(a: str) -> str:
    """``l2_norm`` as SQL text."""
    return (f"sqrt(aggregate(transform(transform({a}, "
            f"x -> double(x)), x -> x * x), 0D, (acc, x) -> acc + x))")


def cosine_sim_sql(a: str, b: str) -> str:
    """``cosine_sim`` as SQL text; 0.0 when either norm is zero."""
    na, nb = l2_norm_sql(a), l2_norm_sql(b)
    return (f"CASE WHEN {na} > 0D AND {nb} > 0D "
            f"THEN {dot_sql(a, b)} / ({na} * {nb}) ELSE 0D END")
