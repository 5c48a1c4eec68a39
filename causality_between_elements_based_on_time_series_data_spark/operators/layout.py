"""Z-order (Morton) multi-dimensional data layout.

Range-partitioning a table on ONE column makes min/max file pruning
work for that column only; predicates on a second column still touch
every file.  Interleaving the bits of two (bucketized) key columns
into a single Morton value and range-partitioning on THAT gives both
predicates sub-linear file footprints — the standard Delta/Iceberg
`OPTIMIZE ZORDER BY` trick, reproduced here with plain column
arithmetic and `repartitionByRange`.

The bit math is deliberately dialect-portable (floor/div/mod/multiply
on BIGINT, 15 bits per dimension → values < 2^30, far inside ANSI
overflow limits) so the same formula runs in Spark and in the DuckDB
oracle: ``zorder_sql`` emits the SQL form, ``zorder_col`` the Column
form, from the same bit loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 15


def zorder_col(x: Column, y: Column) -> Column:
    """Morton-interleave two non-negative integer columns
    (bucketized keys, < 2^15 each) into one BIGINT."""
    x = x.cast("bigint")
    y = y.cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(BITS):
        z = (
            z
            + (F.floor(x / F.lit(2**i)) % 2) * F.lit(2 ** (2 * i))
            + (F.floor(y / F.lit(2**i)) % 2) * F.lit(2 ** (2 * i + 1))
        )
    return z


def zorder_sql(x: str, y: str) -> str:
    """The identical Morton interleave as a SQL expression (DuckDB
    oracle side) — generated from the same bit loop as zorder_col."""
    terms = []
    for i in range(BITS):
        terms.append(f"(CAST(floor(({x}) / {2**i}) AS BIGINT) % 2) * {2 ** (2 * i)}")
        terms.append(f"(CAST(floor(({y}) / {2**i}) AS BIGINT) % 2) * {2 ** (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(df: DataFrame, x: Column, y: Column, n_files: int) -> DataFrame:
    """Return ``df`` repartitioned by range on the Morton value of
    (x, y), ready to write: each output file covers a compact 2-D
    tile, so min/max stats prune on BOTH dimensions."""
    return (
        df.withColumn("__z", zorder_col(x, y))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
