"""Oracle comparison harness mirroring the driver's t2 check:
row-count + schema (column names) + order-insensitive value match.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1).copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(by=list(out.columns), ignore_index=True)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, rtol: float = 1e-6) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av_n = pd.to_numeric(av, errors="coerce")
            bv_n = pd.to_numeric(bv, errors="coerce")
            both_nan = av_n.isna() & bv_n.isna()
            close = [
                bool(n) or math.isclose(x, y, rel_tol=rtol, abs_tol=1e-9)
                for x, y, n in zip(av_n.fillna(0), bv_n.fillna(0), both_nan)
            ]
            bad = [i for i, ok in enumerate(close) if not ok]
            if bad:
                i = bad[0]
                problems.append(
                    f"column {c!r}: {len(bad)} value mismatches, first at row {i}: "
                    f"spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
                )
        else:
            neq = (av.astype(str) != bv.astype(str))
            if neq.any():
                i = int(neq.idxmax())
                problems.append(
                    f"column {c!r}: {int(neq.sum())} value mismatches, first at row {i}: "
                    f"spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
                )
    return problems
