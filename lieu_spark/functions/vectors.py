"""Vector similarity as JVM higher-order-function expressions.

Embedding columns are plain ``array<float>`` — no MLlib types, so the
whole computation stays inside WholeStageCodegen (zip_with + aggregate),
Arrow-transferable, and SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def cosine_with_norms(dot_col: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from a precomputed dot and norms (join-friendly: compute
    norms once per side instead of per pair)."""
    return F.when(
        (norm_a > 0) & (norm_b > 0), dot_col / (norm_a * norm_b)
    ).otherwise(F.lit(0.0))
