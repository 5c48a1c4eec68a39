"""Float-rounding flake sweep (round 12, VERDICT r11 item 6 — the
chow_structural_break family): any registered statistic that round()s
a value derived from order-dependent float moment sums can flip a
final digit against its oracle when Spark's partial-agg order shifts
(run-to-run thread timing, partition count, AQE coalescing).

Empirical detector: every query whose ORACLE contains
round(<moment>(...)) is executed at several shuffle-partition settings
(2 / 32 / 61 — radically different partial-agg tree shapes, a far
wider order perturbation than natural run-to-run jitter) and the full
sorted results are hashed.  A hash that differs across settings is an
order-dependent output surfacing RIGHT NOW — the fix is the CLAUDE.md
integer-quantization rule.  Identical hashes do not prove immunity
(the value may simply sit far from its rounding boundary today), so
the companion structural review in SCALE/PLAN notes still applies to
new statistics; this sweep catches the currently-live ones.

Streaming batch-parity queries are skipped by default (each spins a
real stream; their rollups are the same aggregates the batch twins
exercise) — pass --streaming to include them.

Usage: python tools/float_round_audit.py [--streaming] [names...]
Writes FLOAT_ROUND_AUDIT_r16.json at the repo root
(override with $SPARK_GRAFT_AUDIT_OUT).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARTITION_SETTINGS = [2, 32, 61]
PAT = re.compile(
    r"round\(\s*(avg|sum|stddev|var_samp|var_pop|covar_samp|covar_pop|corr)\(",
    re.I,
)


def _result_hash(df) -> tuple[int, str]:
    rows = df.collect()
    cols = sorted(df.columns)
    lines = sorted(
        "|".join(repr(r[c]) for c in cols) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> None:
    from causality_between_elements_based_on_time_series_data_spark.plans import (
        REGISTRY,
    )
    from causality_between_elements_based_on_time_series_data_spark.session import (
        get_spark,
    )

    include_streaming = "--streaming" in sys.argv
    out_name = os.environ.get("SPARK_GRAFT_AUDIT_OUT", "FLOAT_ROUND_AUDIT_r16.json")
    if "--out" in sys.argv:
        out_name = sys.argv[sys.argv.index("--out") + 1]
    names = [
        a
        for i, a in enumerate(sys.argv[1:], 1)
        if not a.startswith("--") and sys.argv[i - 1] != "--out"
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("float_round_audit")
    spark.sparkContext.setLogLevel("ERROR")

    targets = []
    for name, q in sorted(REGISTRY.items()):
        if names and name not in names:
            continue
        if not q.oracle or not PAT.search(q.oracle):
            continue
        if "streaming" in q.tags and not include_streaming:
            continue
        targets.append(name)
    print(f"auditing {len(targets)} queries x {PARTITION_SETTINGS}")

    base = spark.conf.get("spark.sql.shuffle.partitions")
    flagged: dict[str, list] = {}
    checked: list[str] = []
    errors: dict[str, str] = {}
    try:
        for i, name in enumerate(targets):
            seen = {}
            try:
                for p in PARTITION_SETTINGS:
                    spark.conf.set("spark.sql.shuffle.partitions", str(p))
                    n, h = _result_hash(REGISTRY[name].fn(spark, sf_dir))
                    seen[p] = (n, h)
            except Exception as e:  # noqa: BLE001 — record and continue
                errors[name] = repr(e)[:200]
                continue
            checked.append(name)
            if len({h for _, h in seen.values()}) > 1:
                flagged[name] = [
                    {"partitions": p, "rows": n, "hash": h}
                    for p, (n, h) in sorted(seen.items())
                ]
                print(f"FLAKY {name}: {flagged[name]}")
            if (i + 1) % 20 == 0:
                print(f"  ..{i + 1}/{len(targets)}")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)

    out = {
        "measurement": "order-perturbation sweep of round(float-moment) outputs",
        "sf_dir": sf_dir,
        "partition_settings": PARTITION_SETTINGS,
        "n_checked": len(checked),
        "checked": checked,
        "flagged": flagged,
        "errors": errors,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        out_name,
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": path, "flagged": sorted(flagged)}))


if __name__ == "__main__":
    main()
