"""Registry-wide WindowExec-trap audit: build every registered query's
DataFrame WITH LINEAGE CUTS DISABLED (so plan nodes beneath
``localCheckpoint`` stay visible — the round-9 advice blind spot),
explain it, and report each physical Window node whose partition spec
is empty (or all-literal) — a one-task sort at scale.

Usage: ``python tools/window_audit.py [sf_dir] [name ...]``
(default sf_dir /root/testdata/sf0.001; default all queries).
Prints one line per offending (query, window) pair plus a summary;
``--whitelist`` prints gate-ready whitelist entries instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    as_whitelist = "--whitelist" in args
    args = [a for a in args if a != "--whitelist"]
    sf_dir = "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]

    from causality_between_elements_based_on_time_series_data_spark.lineage import (
        lineage_cuts_disabled,
    )
    from causality_between_elements_based_on_time_series_data_spark.plans import (
        REGISTRY,
    )
    from causality_between_elements_based_on_time_series_data_spark.plans.introspect import (
        ITERATIVE_BUILD_QUERIES,
        formatted_plan,
        input_signature,
        is_ranks_device_window,
        order_signature,
        unpartitioned_windows,
    )
    from causality_between_elements_based_on_time_series_data_spark.session import (
        get_spark,
    )

    spark = get_spark("window-audit")
    names = args or sorted(REGISTRY)
    flagged: dict[str, int] = {}
    errors: dict[str, str] = {}
    entries: dict[str, set] = {}
    for name in names:
        if "eager" in REGISTRY[name].tags:
            continue  # building these executes whole pipelines by contract
        try:
            if name in ITERATIVE_BUILD_QUERIES:
                # iterative builds run per-round actions: cuts stay
                # ACTIVE (see introspect.ITERATIVE_BUILD_QUERIES)
                df = REGISTRY[name].fn(spark, sf_dir)
                nodes = unpartitioned_windows(formatted_plan(df))
            else:
                with lineage_cuts_disabled():
                    df = REGISTRY[name].fn(spark, sf_dir)
                    nodes = unpartitioned_windows(formatted_plan(df))
        except Exception as exc:  # noqa: BLE001 - audit must not stop
            errors[name] = f"{type(exc).__name__}: {exc}"
            continue
        nodes = [n for n in nodes if not is_ranks_device_window(n)]
        if nodes:
            flagged[name] = len(nodes)
            for n in nodes:
                entries.setdefault(name, set()).add(
                    (order_signature(n), input_signature(n))
                )
                if not as_whitelist:
                    print(
                        f"{name}: {n.node} order=[{', '.join(n.order)[:120]}]"
                        f" input=[{', '.join(n.input_cols)[:120]}]"
                        f" funcs={n.functions[:100]}"
                    )
    if as_whitelist:
        for name in sorted(entries):
            sigs = ", ".join(
                f"({o!r}, {i!r})" for o, i in sorted(entries[name])
            )
            print(f'    "{name}": {{{sigs}}},')
    print(
        f"\n== {len(flagged)} / {len(names)} queries carry unpartitioned "
        f"windows (device-internal excluded); {len(errors)} errored =="
    )
    for name, cnt in sorted(flagged.items()):
        print(f"  {name}: {cnt}")
    for name, err in sorted(errors.items()):
        print(f"  ERROR {name}: {err}")


if __name__ == "__main__":
    main()
