"""Spark 4 Python DataSource API (SURVEY §2.1 engine surface): a
custom batch source implemented in pure Python — the extension point
that replaces hand-rolled RDD ingestion for formats Spark lacks.

``make_synthetic_series_datasource()`` builds a source generating a
deterministic per-partition series table (entity, step, value from
fixed integer arithmetic), so the whole source is value-reproducible
in any engine: the DuckDB oracle regenerates the identical rows from
``range()``.  The shape — ``partitions()`` fanning out N independent
``InputPartition``s, each ``read()`` yielding its own rows
executor-side — is exactly how a real connector (REST pages,
message-queue shards, proprietary format splits) plugs in: swap the
arithmetic for I/O and the parallelism, schema contract, and pushdown
boundary stay as demonstrated.

The classes are defined INSIDE the factory, not at module scope:
Spark ships Python data sources to executors with cloudpickle, which
serializes module-level classes by reference (module name) — and the
Python workers of a consumer session (the driver harness) do not have
this repo on their ``sys.path``.  Function-local classes pickle by
value, the same self-containment rule the mapInPandas kernels follow.

Reference parity: the reference's missing ``data_loader`` module
(run.py:3) is a custom text ingestor; this is its first-class Spark-4
equivalent (reference_format.py is the literal-contract port).
"""

from __future__ import annotations

SYNTH_SCHEMA = "entity_id BIGINT, step INT, value DOUBLE"


def make_synthetic_series_datasource():
    """Return a self-contained DataSource class (safe to register from
    any session, any cwd)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class SeriesPartition(InputPartition):
        def __init__(self, pid: int, n_parts: int, n_entities: int, n_steps: int):
            self.pid = pid
            self.n_parts = n_parts
            self.n_entities = n_entities
            self.n_steps = n_steps

    class SyntheticSeriesReader(DataSourceReader):
        def __init__(self, options):
            self.n_parts = int(options.get("partitions", "4"))
            self.n_entities = int(options.get("entities", "40"))
            self.n_steps = int(options.get("steps", "11"))

        def partitions(self):
            return [
                SeriesPartition(p, self.n_parts, self.n_entities, self.n_steps)
                for p in range(self.n_parts)
            ]

        def read(self, partition):
            # entities are striped across partitions; values are fixed
            # integer arithmetic (ANSI-safe, engine-reproducible)
            for e in range(partition.pid, partition.n_entities, partition.n_parts):
                for s in range(partition.n_steps):
                    v = float((e * 31 + s * 7) % 97) / 97.0
                    yield (e, s, v)

    class SyntheticSeriesDataSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_series"

        def schema(self):
            # inline (not the module constant): the class must stay
            # free of references to this module's globals to pickle
            # by value
            return "entity_id BIGINT, step INT, value DOUBLE"

        def reader(self, schema):
            return SyntheticSeriesReader(self.options)

    return SyntheticSeriesDataSource
