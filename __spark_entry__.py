"""Driver contract for the spark-graft builder (PySpark target).

All queries live in the package's plan registry
(``causality_between_elements_based_on_time_series_data_spark.plans``);
this module is a thin adapter.  Each registry entry carries the Spark
implementation and, where ANSI-SQL-expressible, the DuckDB oracle; the
parity test in ``tests/test_parity.py`` runs the exact comparison the
driver runs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from causality_between_elements_based_on_time_series_data_spark.plans import REGISTRY

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the RETAIN-semantics pipeline end-to-end (SURVEY §7
    milestone 0) — events → per-(entity, task) attention features →
    per-task aggregate answer."""
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.ml.retain import (
        retain_entity_features,
    )
    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    events = load_table(spark, SMOKE_SF_DIR, "events")
    feats = retain_entity_features(events)
    return feats.groupBy("task").agg(
        F.count("*").alias("n_entities"),
        F.round(F.avg("context"), 6).alias("avg_context"),
        F.round(F.avg("recency_value"), 6).alias("avg_recency"),
        F.round(F.avg("n_steps"), 4).alias("avg_steps"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; ops that
    are genuinely not SQL-expressible (seeded sampling, LSH banding,
    iterative training, stub decoders) are omitted → rows-only check."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
