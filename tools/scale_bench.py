"""Scale-out measurement harness (round 7): turn the repo's "plans
you'd want at 100x" design arguments into measured scaling exponents.

The driver ships fixtures only up to sf0.1 (read-only), so this tool
synthesizes k-times volumes under /tmp by replicating the sf0.1 tables
with shifted keys, the way real growth happens:

- FACT tables grow: ``events`` gains k-times the users over the SAME
  time window (user_id/event_id shifted per copy, ts untouched),
  ``orders``/``lineitem`` gain k-times the orders against the SAME
  dimensions (o_orderkey/l_orderkey shifted consistently),
  ``documents``/``embeddings`` gain k-times the corpus (ids shifted,
  text/vectors untouched — near-dup structure replicates with it).
- DIMENSION tables stay fixed (region/nation/customer/supplier/part):
  broadcastability must survive the scale-up or the plan was wrong.

Every scale including x1 is a REWRITE of the source (same codec, same
file layout) so timings compare storage-identical inputs.

For each query we record min-of-N wall times per scale and the
least-squares slope of log(t) vs log(k) — the empirical scaling
exponent.  Reading the exponent honestly: fixed per-query overhead
(job launch, planning, ~0.2-0.4 s) drags exponents BELOW the true
asymptotic slope at these sizes, so alpha <= 1.05 is "linear or
better", and anything clearly above ~1.3 is superlinear work that the
sf0.1 bench could never see.  Expected classes:

- grid-bounded causality (transfer_entropy_lag1,
  ccm_cross_mapping_skill): ~flat — the hourly grid does not grow when
  density grows.
- scans/aggs/windows/term-keyed joins: ~1.0.
- cosine_topk_bruteforce: ~2 BY DESIGN (queries are vec_id % 100 == 0,
  so both sides grow) — it exists as the exact baseline; the contrast
  with the ~1.0 IVF route is the point of measuring both.

Usage:
    python tools/scale_bench.py [--scales 1,10,30] [--passes 2]
        [--out /tmp/scale_r7] [--json SCALE_r7.json]
"""

from __future__ import annotations

import argparse
import gc
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_DIR = "/root/testdata/sf0.1"

DIM_TABLES = ["region", "nation", "customer", "supplier", "part"]

# (table, id columns to shift per copy).  Shifting both sides of the
# lineitem<->orders key by the same stride keeps the join graph intact.
FACT_SHIFTS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# Top-10 most expensive bench queries from BENCH_r06 + the dedup
# pipeline pair the verdict called out + the IVF contrast + two cheap
# linear references (q1 scan-agg, sessionize window).
QUERIES = [
    "ccm_cross_mapping_skill",
    "bigram_lm_perplexity",
    "transfer_entropy_lag1",
    "q21_waiting_suppliers",
    "tfidf_top_terms",
    "q7_nation_volume",
    "q5_region_revenue",
    "q9_product_type_profit",
    "retain_entity_features",
    "cosine_topk_bruteforce",
    "llm_dedup_pipeline",
    "dedup_funnel_accounting",
    "ann_rp_ivf_portable_topk",
    "q1_pricing_summary",
    "sessionize_events",
]


def build_scale(spark, out_root: str, k: int) -> str:
    """Write the k-times fixture set under ``out_root/x{k}``."""
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    out_dir = os.path.join(out_root, f"x{k}")
    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    for name in DIM_TABLES:
        load_table(spark, SRC_DIR, name).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )

    for name, shift_cols in FACT_SHIFTS.items():
        base = load_table(spark, SRC_DIR, name)
        strides = {
            c: int(base.agg(F.max(c)).first()[0]) + 1 for c in shift_cols
        }
        copies = []
        for i in range(k):
            c = base
            for col, stride in strides.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * stride))
            copies.append(c)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))

    with open(os.path.join(out_dir, "_DONE"), "w") as fh:
        fh.write(str(k))
    return out_dir


def fit_exponent(scales: list[int], times: list[float]) -> float:
    xs = [math.log(s) for s in scales]
    ys = [math.log(max(t, 1e-9)) for t in times]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    if denom == 0:
        return float("nan")
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,30")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--out", default="/tmp/scale_r7")
    ap.add_argument("--json", default=None)
    ap.add_argument("--queries", default=None, help="comma list override")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    names = args.queries.split(",") if args.queries else QUERIES
    # recorded BEFORE any Spark work: the artifact-backed check of the
    # CLAUDE.md one-workload rule (end-of-run load is this run's own
    # tail — VERDICT r13 nit #1)
    load_before = tuple(round(x, 2) for x in os.getloadavg())

    from causality_between_elements_based_on_time_series_data_spark.plans import (
        REGISTRY,
    )
    from causality_between_elements_based_on_time_series_data_spark.session import (
        get_spark,
    )

    spark = get_spark("scale-bench")

    dirs = {}
    for k in scales:
        t0 = time.monotonic()
        dirs[k] = build_scale(spark, args.out, k)
        print(
            f"[fixture] x{k} ready at {dirs[k]} "
            f"({time.monotonic() - t0:.1f}s)",
            file=sys.stderr,
        )

    # Warmup at the smallest scale: JVM JIT + codegen caches.
    REGISTRY["q1_pricing_summary"].fn(spark, dirs[scales[0]]).write.format(
        "noop"
    ).mode("overwrite").save()

    results: dict[str, dict] = {}
    for name in names:
        q = REGISTRY[name]
        per_scale: dict[int, float] = {}
        passes: dict[int, list[float]] = {}
        # Per-query untimed warmup at the smallest scale: the first
        # execution of a query pays one-off codegen/JIT costs that
        # would otherwise inflate whichever scale runs first and bend
        # the fitted exponent (observed: 2x on the x1 point).
        q.fn(spark, dirs[scales[0]]).write.format("noop").mode(
            "overwrite"
        ).save()
        for k in scales:
            ts = []
            for _ in range(args.passes):
                t0 = time.monotonic()
                q.fn(spark, dirs[k]).write.format("noop").mode("overwrite").save()
                ts.append(round(time.monotonic() - t0, 3))
                # bench.py's round-11 lesson, re-learned by the r15
                # registry sweep (VERDICT r15 item 7): drop py4j
                # DataFrame refs so ContextCleaner frees each query's
                # localCheckpoint blocks — without this the block
                # manager accumulates state across queries/scales and
                # later points read several-fold slow
                # (incremental_dedup_new_batch: 104.7 s swept vs 5.4 s
                # isolated).
                gc.collect()
            passes[k] = ts
            per_scale[k] = min(ts)
            print(f"[time] {name} x{k}: {min(ts):.2f}s {ts}", file=sys.stderr)
        alpha = fit_exponent(scales, [per_scale[k] for k in scales])
        results[name] = {
            "times": {str(k): per_scale[k] for k in scales},
            "passes": {str(k): passes[k] for k in scales},
            "alpha": round(alpha, 3),
        }
        print(f"[alpha] {name}: {alpha:.3f}", file=sys.stderr)

    out = {
        "scales": scales,
        "base_sf_dir": SRC_DIR,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "load_before": load_before,
        "load_avg": tuple(round(x, 2) for x in os.getloadavg()),
        "results": results,
    }
    line = json.dumps(out)
    print(line)
    if args.json:
        with open(args.json, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
