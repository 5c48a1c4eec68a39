"""Multimodal-column pipeline runner — the binary-payload companion
to ``run_llm_pipeline.py`` (SURVEY §2.11 multimodal pillar).

Chains the multimodal operators the way a mixed-media lake owner
runs them:

1. INGEST: documents wrapped as the media table (opaque BINARY
   payload + typed meta struct — the columnar contract real
   image/audio bytes travel under), byte-length stats.
2. TRANSFORM: the mapInPandas stages — resize (deterministic
   truncation stub where a real resampler drops in) and 1→N frame
   sampling (the video-sampler row-expansion shape).
3. DECODE: the RAWRGB decoder — a REAL raster decode (magic check,
   header parse, channel statistics) over the in-repo format, the
   slot a jpeg/png decoder fills for external corpora.
4. STORAGE PLANNING: the CAS chunk-dedup estimator (fixed 32-byte
   chunks, global pool, per-source savings) and the
   fixed-vs-content-defined chunking experiment under alignment
   shifts — the two tables that decide whether chunk-level dedup is
   worth adopting and WHICH chunker to use.

Every stage is deterministic and hash-checked against DuckDB oracles
in the registry (tests/test_parity.py; the driver re-checks per
round).

Run: ``python examples/run_multimodal_pipeline.py [sf_dir]``
(default /root/testdata/sf0.01).  Unknown ``--flags`` fail loudly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    if flags:
        sys.exit(f"unknown flag(s) {sorted(flags)}; this runner takes none")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    from causality_between_elements_based_on_time_series_data_spark.plans import (
        REGISTRY,
    )
    from causality_between_elements_based_on_time_series_data_spark.session import (
        get_spark,
    )

    spark = get_spark("multimodal-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    print("== payload stats (BINARY column + typed meta) ==")
    REGISTRY["multimodal_payload_stats"].fn(spark, sf_dir).show(5)

    print("== modality routing (magic-byte sniff over the mixed corpus) ==")
    REGISTRY["multimodal_modality_router"].fn(spark, sf_dir).show(
        truncate=False
    )

    print("== resize stage (mapInPandas, geometry-real stub) ==")
    REGISTRY["multimodal_resize_stats"].fn(spark, sf_dir).show(5)

    print("== frame sampling (1->N row expansion) ==")
    REGISTRY["multimodal_frame_sample"].fn(spark, sf_dir).show(8)

    print("== RAWRGB decode (real raster decoder over the repo format) ==")
    REGISTRY["multimodal_rawrgb_decode"].fn(spark, sf_dir).show(5)

    print("== CAS chunk-dedup estimate (global pool, per-source) ==")
    REGISTRY["multimodal_chunk_dedup_estimate"].fn(spark, sf_dir).show(8)

    print("== chunker choice: fixed 32B vs content-defined, under shifts ==")
    REGISTRY["multimodal_cdc_shift_robustness"].fn(spark, sf_dir).show(
        truncate=False
    )
    print(
        "adoption rule of thumb: saved_frac(cdc) >> saved_frac(fixed32) "
        "on shifted twins -> media mutations are insert/prepend-shaped, "
        "adopt CDC; comparable -> appends/aligned edits, fixed chunks "
        "are cheaper to compute."
    )


if __name__ == "__main__":
    main()
