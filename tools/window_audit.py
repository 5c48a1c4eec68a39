"""Registry-wide WindowExec-trap audit: build every registered query's
DataFrame, explain it, and report each physical Window node whose
partition spec is empty (or all-literal) — a one-task sort at scale.

Usage: ``python tools/window_audit.py [sf_dir] [name ...]``
(default sf_dir /root/testdata/sf0.001; default all queries).
Prints one line per offending (query, window) pair plus a summary.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]

    from causality_between_elements_based_on_time_series_data_spark.plans import (
        REGISTRY,
    )
    from causality_between_elements_based_on_time_series_data_spark.plans.introspect import (
        formatted_plan,
        unpartitioned_windows,
    )
    from causality_between_elements_based_on_time_series_data_spark.session import (
        get_spark,
    )

    spark = get_spark("window-audit")
    names = args or sorted(REGISTRY)
    flagged: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            nodes = unpartitioned_windows(formatted_plan(df))
        except Exception as exc:  # noqa: BLE001 - audit must not stop
            errors[name] = f"{type(exc).__name__}: {exc}"
            continue
        if nodes:
            flagged[name] = len(nodes)
            for n in nodes:
                print(
                    f"{name}: {n.node} order=[{', '.join(n.order)[:120]}] "
                    f"funcs={n.functions[:100]}"
                )
    print(
        f"\n== {len(flagged)} / {len(names)} queries carry unpartitioned "
        f"windows; {len(errors)} errored =="
    )
    for name, cnt in sorted(flagged.items()):
        print(f"  {name}: {cnt}")
    for name, err in sorted(errors.items()):
        print(f"  ERROR {name}: {err}")


if __name__ == "__main__":
    main()
