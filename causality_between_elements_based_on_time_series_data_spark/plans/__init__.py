"""Query-plan registry package.

Importing this package populates :data:`registry.REGISTRY` with every
engine query (each a Spark callable plus, where expressible, an ANSI
SQL oracle for DuckDB).  ``__spark_entry__.py`` and the parity tests
both read from the same registry, so "the driver's correctness gate"
and "local pytest" are the identical check.
"""

from . import (  # noqa: F401  (import for registration side effects)
    queries_causality,
    queries_dataops,
    queries_experiments,
    queries_llm,
    queries_ml,
    queries_panel,
    queries_relational,
    queries_sources,
    queries_timeseries,
    queries_tsdiag,
    queries_window,
)
from .registry import REGISTRY, Query, register

__all__ = ["REGISTRY", "Query", "register"]
