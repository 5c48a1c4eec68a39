"""Central query registry.

Every operator the engine claims (SURVEY.md §2 inventory + §2.11
extensions) is registered here as a :class:`Query`:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation.
- ``oracle`` — equivalent ANSI SQL for DuckDB over the same parquet
  views, or ``None`` for genuinely non-SQL-expressible ops (LSH
  banding, iterative training) which take the driver's weaker
  rows-only check.

Parity discipline (SURVEY §7 "hard parts" 3-4): float aggregates are
rounded identically on both sides (``round(x, N)``), integer sums are
cast to BIGINT in DuckDB (its SUM(int) returns HUGEINT), and column
names/aliases match exactly — the driver sorts columns by name before
hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def sql_tanh(x: str) -> str:
    """tanh for the DuckDB oracle (1.0 lacks a tanh function): the
    overflow-stable two-sided form, exact for all finite doubles."""
    return (
        f"(CASE WHEN ({x}) >= 0 THEN 1 - 2 / (exp(2 * ({x})) + 1) "
        f"ELSE 2 / (exp(-2 * ({x})) + 1) - 1 END)"
    )


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: add a query implementation to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco
