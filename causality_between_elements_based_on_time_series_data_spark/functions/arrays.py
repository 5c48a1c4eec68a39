"""Array/vector function surface.

The reference's tensor math (embedding matmul ``model.py:132``, context
vector ``model.py:147``, norms ``model.py:178-181``) maps to Spark
higher-order array functions: ``zip_with`` + ``aggregate`` stay inside
whole-stage codegen, so the hot path never crosses into Python.
Double-precision accumulators throughout (SURVEY §7 hard-part 4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def det_vector(dim: int) -> list[float]:
    """Deterministic pseudo-random unit-ish vector shared by the Spark
    queries and the generated DuckDB oracle SQL (same literal values on
    both sides — the reference's fixed V matrix analog)."""
    return [round(((i * 37 + 11) % 97) / 97.0 - 0.5, 6) for i in range(dim)]


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (JVM-side, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_with_const(a: Column, vec: list[float]) -> Column:
    """Dot product against a driver-side constant vector (broadcast
    into the plan as an array literal)."""
    return dot_product(a, F.array(*[F.lit(float(v)) for v in vec]))


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
