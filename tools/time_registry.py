"""Time EVERY non-eager registry query once (noop sink) at the given
SF — the optimization round's full-coverage sweep.  Not a benchmark
(single pass, cold-ish): it ranks operators so the expensive ones get
the isolated min-of-N treatment (`tools/scale_bench.py --queries`),
and it is the evidence behind the OPTIMIZATION_r{N}.md checklist's
"examined" column.

Usage: python tools/time_registry.py [--sf-dir DIR] [--json OUT]
       [--skip-tags streaming] [--only substr]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--json", default="/tmp/registry_times.json")
    ap.add_argument("--only", default=None, help="substring filter on query name")
    ap.add_argument(
        "--skip-tags",
        default=None,
        help="comma list of tags to skip (e.g. streaming,eager)",
    )
    args = ap.parse_args()
    skip_tags = set(args.skip_tags.split(",")) if args.skip_tags else set()

    from causality_between_elements_based_on_time_series_data_spark.plans import REGISTRY
    from causality_between_elements_based_on_time_series_data_spark.session import get_spark

    spark = get_spark("time-registry")
    times: dict[str, float] = {}
    errs: dict[str, str] = {}
    names = sorted(REGISTRY)
    if args.only:
        names = [n for n in names if args.only in n]
    if skip_tags:
        names = [n for n in names if not (skip_tags & set(REGISTRY[n].tags))]
    for name in names:
        q = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"time-registry: {name}")
        t0 = time.monotonic()
        try:
            df = q.fn(spark, args.sf_dir)
            # eager-tagged queries run their action while building; the
            # noop write still forces the returned relation
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.monotonic() - t0, 3)
        except Exception as ex:  # keep sweeping; report at the end
            errs[name] = f"{type(ex).__name__}: {ex}"[:300]
        print(f"{name}: {times.get(name, 'ERR')}", flush=True)
        # drop py4j DataFrame refs so ContextCleaner can free each
        # query's localCheckpoint blocks (bench.py's lesson: without
        # this the sweep accumulates block-manager state and inflates
        # later queries several-fold)
        import gc

        gc.collect()
    spark.sparkContext.setJobDescription(None)

    out = {
        "sf_dir": args.sf_dir,
        "n": len(times),
        "errs": errs,
        "total": round(sum(times.values()), 1),
        "times": dict(sorted(times.items(), key=lambda kv: -kv[1])),
    }
    with open(args.json, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"n": len(times), "errs": len(errs), "total": out["total"]}))


if __name__ == "__main__":
    main()
