"""PySpark-native analytics engine with the query / data-processing
capabilities of OpenXAIProject/Causality-between-elements-based-on-time-series-data.

The reference (see SURVEY.md) is a RETAIN-attention + AMTL multi-task
research codebase whose computational semantics — time-series
tensorization, attention-weighted temporal aggregation, per-task
supervised heads, inter-task causality matrix B — are re-expressed here
as idiomatic Spark: DataFrame/SQL plans optimized by Catalyst, window
functions for sequence features, Arrow-vectorized pandas UDFs only
where built-ins genuinely cannot express the math, and a driver-side
iterative loop (the MLlib pattern) for training.

Layout
------
- ``sources``    — table catalog over the driver's parquet fixtures.
- ``functions``  — scalar/array/text function surface (SURVEY §2.8).
- ``operators``  — named engine operators (joins, windows, dedup, ANN,
                   as-of, tensorization, multimodal plumbing).
- ``plans``      — the query registry: every operator exposed as a
                   (spark_fn, oracle_sql) pair consumed by
                   ``__spark_entry__.py`` and the parity tests.
- ``ml``         — RETAIN attention semantics + AMTL causality training.
- ``streaming``  — Structured Streaming skin over the events table.
"""

__version__ = "0.1.0"
