"""Persisted-index incremental-dedup scale measurement (round 11,
VERDICT r10 #5): grow the INDEX while holding the BATCH fixed, and
time the two phases separately —

* build(k): signature + bucketBy-write of the k×-replicated index
  (the once-per-corpus-version cost);
* probe(k): batch-side signatures + the three persisted-table joins +
  the report (the recurring per-ingest cost).

The claim under test: probe cost is (near-)independent of index size
— the index is never re-signatured and never re-shuffled at probe
time; what remains index-proportional is only the sequential
bucket-local merge read of the posting table.

Replicated index docs get a per-replica token suffix so clones are
GENUINE new documents (identical texts would pile into the same band
buckets and the occupancy guard would just drop them — the r10 clone
pathology — which would fake a flat curve).

Run alone on the box (CLAUDE.md bench rule): load_avg is recorded.

Usage: python tools/scale_incdedup.py  → SCALE_r11_incdedup.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTORS = [int(x) for x in os.environ.get(
    "SPARK_GRAFT_INCDEDUP_FACTORS", "1,10,30"
).split(",")]


def main() -> None:
    from pyspark.sql import functions as F

    from causality_between_elements_based_on_time_series_data_spark.plans.queries_llm import (
        _MH_MAX_BUCKET,
        band_rows,
        portable_signatures,
    )
    from causality_between_elements_based_on_time_series_data_spark.session import get_spark
    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
        reset_bucket_table,
        session_bucket_table,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_before = tuple(round(x, 2) for x in os.getloadavg())
    spark = get_spark("scale_incdedup")
    log4j = spark._jvm.org.apache.logging.log4j
    log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec", log4j.Level.ERROR
    )

    docs = load_table(spark, sf_dir, "documents")
    t_split = docs.agg(
        F.floor(0.8 * (F.max("doc_id") + 1)).cast("bigint")
    ).first()[0]
    stride = docs.agg(F.max("doc_id") + 1).first()[0]
    batch = docs.filter(F.col("doc_id") >= t_split).select(
        "doc_id", "lang", "text"
    )
    batch.localCheckpoint(eager=True)  # fixed probe input, derived once
    idx_base = docs.filter(F.col("doc_id") < t_split).select(
        "doc_id", "text"
    )

    try:
        initial_parts = int(spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
        ))
    except Exception:
        initial_parts = 0
    n_bkts = max(
        64,
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        initial_parts,
    )

    rows = []
    for k in FACTORS:
        # k replicas, each a GENUINE new doc (suffix token perturbs
        # the shingle set); ids offset by replica stride
        reps = [
            idx_base.select(
                (F.col("doc_id") + F.lit(i * stride)).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(f" rep{i}tok"),
                    (F.col("doc_id") % 97).cast("string"),
                ).alias("text"),
            )
            for i in range(k)
        ]
        idx_docs = reps[0]
        for r in reps[1:]:
            idx_docs = idx_docs.unionByName(r)

        t_bands = session_bucket_table(spark, f"sb_idx_bands_x{k}")
        t_counts = session_bucket_table(spark, f"sb_idx_bcounts_x{k}")
        t_keys = session_bucket_table(spark, f"sb_idx_keys_x{k}")
        for t in (t_bands, t_counts, t_keys):
            reset_bucket_table(spark, t)

        t0 = time.monotonic()
        idx_bands = band_rows(portable_signatures(idx_docs))
        (idx_bands.write.bucketBy(n_bkts, "band_id", "band_val")
         .sortBy("band_id", "band_val").saveAsTable(t_bands))
        (idx_bands.groupBy("band_id", "band_val")
         .agg(F.count("*").cast("bigint").alias("n_idx"))
         .write.bucketBy(n_bkts, "band_id", "band_val")
         .sortBy("band_id", "band_val").saveAsTable(t_counts))
        (idx_docs.select(F.sha2("text", 256).alias("h")).distinct()
         .write.bucketBy(n_bkts, "h").sortBy("h").saveAsTable(t_keys))
        build_s = round(time.monotonic() - t0, 3)
        n_idx_rows = spark.table(t_bands).count()

        def probe() -> float:
            t0 = time.monotonic()
            exact = (
                batch.select("doc_id", F.sha2("text", 256).alias("h"))
                .join(spark.table(t_keys), "h", "semi")
                .select("doc_id")
                .localCheckpoint(eager=False)
            )
            b_bands = band_rows(
                portable_signatures(batch.select("doc_id", "text"))
            )
            b_counts = b_bands.groupBy("band_id", "band_val").agg(
                F.count("*").alias("__bn")
            )
            ok = (
                b_counts.join(
                    spark.table(t_counts), ["band_id", "band_val"], "left"
                )
                .filter(
                    F.coalesce(F.col("n_idx"), F.lit(0)) + F.col("__bn")
                    <= _MH_MAX_BUCKET
                )
                .select("band_id", "band_val")
            )
            probe_side = b_bands.join(ok, ["band_id", "band_val"], "semi")
            cand = (
                spark.table(t_bands)
                .select("band_id", "band_val", F.col("doc_id").alias("id_a"))
                .join(
                    probe_side.select(
                        "band_id", "band_val",
                        F.col("doc_id").alias("id_b"),
                    ),
                    ["band_id", "band_val"],
                )
                .select("id_a", "id_b")
                .distinct()
            )
            flagged = cand.groupBy("id_b").agg(
                F.count("*").alias("n_cand")
            )
            report = (
                batch.select("doc_id", "lang")
                .join(exact.withColumn("_e", F.lit(1)), "doc_id", "left")
                .join(
                    flagged.withColumnRenamed("id_b", "doc_id"),
                    "doc_id", "left",
                )
                .groupBy("lang")
                .agg(
                    F.count("*").alias("n_new"),
                    F.sum(F.coalesce("_e", F.lit(0))).alias("n_exact"),
                    F.sum(F.coalesce("n_cand", F.lit(0))).alias("n_cand"),
                )
            )
            report.write.format("noop").mode("overwrite").save()
            return round(time.monotonic() - t0, 3)

        p1 = probe()
        p2 = probe()
        probe_s = min(p1, p2)
        rows.append({
            "factor": k,
            "index_rows": n_idx_rows,
            "build_s": build_s,
            "probe_s": probe_s,
            "probe_passes": [p1, p2],
        })
        print(json.dumps(rows[-1]))
        for t in (t_bands, t_counts, t_keys):
            reset_bucket_table(spark, t)

    out = {
        "measurement": "incremental_dedup_persisted_index probe vs index size",
        "sf_dir": sf_dir,
        "n_buckets": n_bkts,
        # end-of-run load is dominated by this run itself; the
        # quiet-box check is load_before (CLAUDE.md bench rule)
        "load_before": load_before,
        "load_after": tuple(round(x, 2) for x in os.getloadavg()),
        "rows": rows,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_r11_incdedup.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": path}))


if __name__ == "__main__":
    main()
