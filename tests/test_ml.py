"""AMTL causality-loop tests (SURVEY.md §5.2 items 2-3): golden numpy
gradient parity, loss decrease on separable data, B-matrix structure.
"""

from __future__ import annotations

import numpy as np
import pytest

from causality_between_elements_based_on_time_series_data_spark.ml.amtl import (
    AMTLConfig,
    AMTLTrainer,
)

TASKS = ["angina", "cerebral", "myocardial"]


@pytest.fixture(scope="module")
def synthetic_feats(spark):
    rng = np.random.default_rng(7)
    rows = []
    for ti, task in enumerate(TASKS):
        for i in range(80):
            x = rng.normal(size=2)
            # separable signal, slightly rotated per task
            y = 1.0 if x[0] + 0.3 * ti * x[1] > 0 else 0.0
            rows.append((i, task, [float(x[0]), float(x[1])], y))
    return spark.createDataFrame(rows, "entity_id long, task string, x array<double>, y double")


def test_loss_decreases_and_b_structure(spark, synthetic_feats):
    cfg = AMTLConfig(total_iter=25, lr=0.5, check_iter=5)
    trainer = AMTLTrainer(cfg).fit(synthetic_feats)
    assert cfg.history[0] > cfg.history[-1], cfg.history
    bdf = trainer.b_matrix_df(spark).toPandas()
    # T·(T−1) rows, diagonal structurally absent (model.py:92 semantics)
    assert len(bdf) == len(TASKS) * (len(TASKS) - 1)
    assert not (bdf.src_task == bdf.dst_task).any()


def test_distributed_gradient_matches_numpy(spark, synthetic_feats):
    """The applyInPandas partial-aggregation must equal a single-node
    numpy computation of the same CE loss/gradient (model.py:159)."""
    trainer = AMTLTrainer(AMTLConfig())
    trainer.tasks = TASKS
    rng = np.random.default_rng(3)
    trainer.W = rng.normal(0.0, 0.1, size=(len(TASKS), 3))

    dist = trainer._distributed_partials(synthetic_feats)

    pdf = synthetic_feats.toPandas()
    for ti, task in enumerate(TASKS):
        g = pdf[pdf.task == task]
        X = np.vstack([np.asarray(v) for v in g.x])
        X = np.hstack([X, np.ones((len(X), 1))])
        y = g.y.to_numpy()
        w = trainer.W[ti]
        z = X @ w
        loss = (np.maximum(z, 0) - z * y + np.log1p(np.exp(-np.abs(z)))).sum()
        grad = X.T @ (1 / (1 + np.exp(-z)) - y)
        n, loss_d, grad_d = dist[task]
        assert n == len(X)
        np.testing.assert_allclose(loss_d, loss, rtol=1e-9)
        np.testing.assert_allclose(grad_d, grad, rtol=1e-9)


def test_b_matrix_parquet_roundtrip(spark, synthetic_feats, tmp_path):
    trainer = AMTLTrainer(AMTLConfig(total_iter=3)).fit(synthetic_feats)
    out = str(tmp_path / "b_matrix")
    trainer.write_b_matrix(spark, out, round_no=1)
    trainer.write_b_matrix(spark, out, round_no=2)
    back = spark.read.parquet(out)
    assert back.count() == 2 * len(TASKS) * (len(TASKS) - 1)
    assert set(back.columns) == {"src_task", "dst_task", "weight", "round"}
