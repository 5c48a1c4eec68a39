"""Fast single-query oracle check: `python tools/check_query.py name [name...]`
runs each named registry query at sf0.01 and compares against its DuckDB
oracle with the same column-sorted / value-tolerant compare the driver
uses.  Iteration helper only — the authoritative artifact comes from
tools/drive_contract.py.
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> str | None:
    if sorted(sdf.columns) != sorted(odf.columns):
        return f"schema {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return f"rowcount {len(sdf)} vs {len(odf)}"
    a = sdf.reindex(sorted(sdf.columns), axis=1)
    b = odf.reindex(sorted(odf.columns), axis=1)
    for c in a.columns:
        if a[c].dtype == object:
            a[c] = a[c].astype(str)
        if b[c].dtype == object:
            b[c] = b[c].astype(str)
    a = a.sort_values(by=list(a.columns), ignore_index=True)
    b = b.sort_values(by=list(b.columns), ignore_index=True)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            ax = pd.to_numeric(a[c], errors="coerce")
            bx = pd.to_numeric(b[c], errors="coerce")
            bad = [
                (x, y)
                for x, y in zip(ax, bx)
                if not (
                    (pd.isna(x) and pd.isna(y))
                    or (
                        not pd.isna(x)
                        and not pd.isna(y)
                        and math.isclose(x, y, rel_tol=1e-6, abs_tol=1e-9)
                    )
                )
            ]
            if bad:
                return f"col {c}: {len(bad)} diffs e.g. {bad[0]}"
        else:
            if (a[c].astype(str) != b[c].astype(str)).any():
                diffs = a[c].astype(str) != b[c].astype(str)
                i = diffs.idxmax()
                return f"col {c} mismatch e.g. row {i}: {a[c][i]} vs {b[c][i]}"
    return None


def main() -> None:
    from causality_between_elements_based_on_time_series_data_spark.plans import REGISTRY
    from causality_between_elements_based_on_time_series_data_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("check-query")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    failed = False
    for name in sys.argv[1:]:
        q = REGISTRY[name]
        sdf = q.fn(spark, sf).toPandas()
        if q.oracle is None:
            print(f"{name}: rows-only n={len(sdf)}")
            continue
        odf = con.execute(q.oracle).df()
        prob = compare(sdf, odf)
        print(f"{name}: {'MATCH rows=' + str(len(sdf)) if prob is None else 'MISMATCH ' + prob}")
        failed = failed or prob is not None
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
