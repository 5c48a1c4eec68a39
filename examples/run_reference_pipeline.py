"""End-to-end reference-workflow runner (the engine's `python run.py`).

Mirrors the reference entry point's lifecycle (`/root/reference/
run.py:39-73`): config dict with the same keys → per-disease
train/test text files (the inferred `load_data` contract) → RETAIN-
style temporal featurization → AMTL multi-task training with periodic
eval + min tracking → causality-matrix dump.  A user of the reference
points `data_path` at their per-disease directories and runs this
instead; everything executes distributed on Spark.

Differences from the reference, by design (SURVEY.md §1.2/§3.3):
tensors become long-format DataFrames, the per-task Python lists
become a `task` column, the recurrent featurizer is the window-based
RETAIN semantics (swap in `ml.rnn.retain_fidelity` features for
recurrence-faithful numerics), and the B-matrix text sink becomes a
round-partitioned parquet dataset.

Run: ``python examples/run_reference_pipeline.py`` (synthesizes demo
data under /tmp when `data_path` is absent).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from causality_between_elements_based_on_time_series_data_spark.ml.amtl import (
    AMTLConfig,
    AMTLTrainer,
)
from causality_between_elements_based_on_time_series_data_spark.session import get_spark
from causality_between_elements_based_on_time_series_data_spark.sources.reference_format import (
    load_data,
    write_reference_format,
)

# Same config surface as the reference (run.py:7-37), minus the TF
# session plumbing; ld_l2 is dead config there and omitted here.
config = {
    "model_tag": "multitask_asym_lastlayer_sqrtn_spark",
    "data_path": "/tmp/spark_graft_demo_data",
    "diseases": ["cerebralinfarction", "anginapectoris", "myocardialinfarction"],
    "num_features": 8,
    "steps": 6,
    "lr": 1e-1,
    "check_iter": 5,
    "total_iter": 25,
    "save_dir": "/tmp/spark_graft_demo_checkpoints",
    "asym_mu": 0.005,
    "asym_lambda": 0.005,
}


def synthesize_demo_data() -> None:
    """Create per-disease train/test files in the reference layout:
    <data_path>/<disease>/<disease>_{train,test}.txt."""
    rng = np.random.default_rng(42)
    width = config["steps"] * config["num_features"]
    for d_i, disease in enumerate(config["diseases"]):
        for split, n in [("train", 200), ("test", 80)]:
            rows, labels = [], []
            for _ in range(n):
                x = rng.normal(size=width)
                signal = x[: config["num_features"]].mean() + 0.2 * d_i
                rows.append(list(x))
                labels.append(int(signal > 0))
            write_reference_format(
                rows, labels, os.path.join(config["data_path"], disease, f"{disease}_{split}.txt")
            )


def featurize(long_df):
    """Per-entity features from the long format: mean of feature 0
    across steps, last-step mean, step count — the lag/agg replacement
    for the recurrent encoder (SURVEY §2.5 decision)."""
    f0 = F.element_at("features", 1).cast("double")
    fmean = F.aggregate(
        F.col("features"), F.lit(0.0), lambda a, x: a + x.cast("double")
    ) / F.size("features")
    return (
        long_df.groupBy("entity_id", "task")
        .agg(
            F.avg(f0).alias("avg_f0"),
            F.avg(fmean).alias("avg_all"),
            F.max(F.when(F.col("step") == config["steps"] - 1, fmean)).alias("last_step_mean"),
            F.first("label").alias("label"),
        )
        .select(
            "entity_id",
            "task",
            F.array("avg_f0", "avg_all", "last_step_mean").alias("x"),
            F.col("label").cast("double").alias("y"),
        )
    )


def main() -> None:
    if not os.path.isdir(config["data_path"]):
        synthesize_demo_data()
    spark = get_spark(config["model_tag"])

    train_parts, eval_parts = [], []
    for disease in config["diseases"]:  # per-disease files (run.py:44-55)
        base = os.path.join(config["data_path"], disease)
        train_parts.append(
            load_data(spark, config["num_features"], config["steps"], base, f"{disease}_train.txt", task=disease)
        )
        eval_parts.append(
            load_data(spark, config["num_features"], config["steps"], base, f"{disease}_test.txt", task=disease)
        )
    train_long = train_parts[0]
    eval_long = eval_parts[0]
    for p in train_parts[1:]:
        train_long = train_long.unionByName(p)
    for p in eval_parts[1:]:
        eval_long = eval_long.unionByName(p)

    cfg = AMTLConfig(
        lr=config["lr"],
        mu=config["asym_mu"],
        lambda_=config["asym_lambda"],
        total_iter=config["total_iter"],
        check_iter=config["check_iter"],
    )
    trainer = AMTLTrainer(cfg).fit(featurize(train_long), featurize(eval_long))

    print("train objective checkpoints:", [round(v, 4) for v in cfg.history])
    print("eval min per task (loss, iter):")
    trainer.eval_min_df(spark).show(truncate=False)
    print("causality matrix B (src -> dst transfer):")
    trainer.b_matrix_df(spark).orderBy("src_task", "dst_task").show(truncate=False)

    b_path = os.path.join(config["save_dir"], "b_matrix")
    trainer.write_b_matrix(spark, b_path, round_no=0)  # ≙ B_matrix_loss_sqrtn.txt
    print(f"B matrix written to {b_path}")

    # model checkpoint (the tf.train.Saver the reference creates but
    # never fires, model.py:216-217) — save + reload round-trip
    ckpt_path = os.path.join(config["save_dir"], "model")
    trainer.save(spark, ckpt_path)
    restored = AMTLTrainer.load(spark, ckpt_path)
    assert restored.tasks == trainer.tasks
    print(f"checkpoint saved + restored from {ckpt_path}")


if __name__ == "__main__":
    main()
