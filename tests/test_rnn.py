"""RNN-fidelity oracle test (SURVEY.md §5.2 item 2): the distributed
applyInPandas kernel must match an independently-written numpy
implementation of the same RETAIN forward math, rtol 1e-6.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pytest

from causality_between_elements_based_on_time_series_data_spark.ml.rnn import (
    fidelity_weights,
    retain_fidelity,
)


def numpy_retain_oracle(
    values: list[float],
    w: dict,
    cell: str = "lstm",
    keep_prob: float = 1.0,
    dropout_seed: int = 13,
) -> tuple[float, float]:
    """Independent re-derivation of the RETAIN forward pass
    (reverse-time stacked LSTM/GRU -> per-layer output dropout ->
    alpha/beta attention -> context -> head)."""
    V = np.asarray(w["V"])
    layers = [(np.asarray(w["Wx"]), np.asarray(w["Wh"]), np.asarray(w["b"]))] + [
        (np.asarray(x["Wx"]), np.asarray(x["Wh"]), np.asarray(x["b"]))
        for x in w.get("extra_layers", [])
    ]
    hid = layers[0][1].shape[0]
    emb = np.asarray(values, dtype=np.float64)[:, None] @ V
    sig = lambda a: 1 / (1 + np.exp(-a))

    hs = [np.zeros(hid) for _ in layers]
    cs = [np.zeros(hid) for _ in layers]
    states = []
    for t, v in enumerate(emb[::-1]):
        inp = v
        for li, (Wx, Wh, b) in enumerate(layers):
            h = hs[li]
            if cell == "gru":
                zr = sig(inp @ Wx[:, : 2 * hid] + h @ Wh[:, : 2 * hid] + b[: 2 * hid])
                r, u = np.split(zr, 2)
                cand = np.tanh(inp @ Wx[:, 2 * hid :] + (r * h) @ Wh[:, 2 * hid :] + b[2 * hid :])
                h = u * h + (1 - u) * cand
            else:
                z = inp @ Wx + h @ Wh + b
                i, f, g, o = np.split(z, 4)
                cs[li] = sig(f) * cs[li] + sig(i) * np.tanh(g)
                h = sig(o) * np.tanh(cs[li])
            hs[li] = h
            out = h.copy()
            if keep_prob < 1.0:
                units = np.arange(hid)
                keep = (
                    (t * 2654435761 + units * 40503 + dropout_seed * 97 + li * 7919) % 1000
                ) < keep_prob * 1000
                out = out * np.where(keep, 1.0 / keep_prob, 0.0)
            inp = out
        states.append(inp)
    H = np.array(states)[::-1]

    s = H @ np.asarray(w["w_alpha"]) + np.asarray(w["b_alpha"])
    s = s - s.max()
    alpha = np.exp(s) / np.exp(s).sum()
    beta = np.tanh(H @ np.asarray(w["W_beta"]) + np.asarray(w["b_beta"]))
    ctx = (alpha * beta * emb).sum(axis=0)
    logit = float(ctx @ np.asarray(w["w_out"]) + np.asarray(w["b_out"]))
    return logit, float(1 / (1 + np.exp(-logit)))


@pytest.fixture(scope="module")
def tiny_sequences(spark):
    t0 = datetime(2024, 1, 1)
    rows = []
    rng = np.random.default_rng(11)
    for uid in range(5):
        for task in ["click", "purchase"]:
            for step in range(7):
                rows.append(
                    (
                        uid * 100 + step,
                        t0 + timedelta(minutes=step),
                        uid,
                        task,
                        float(rng.normal()),
                    )
                )
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_fidelity_matches_numpy_oracle(spark, tiny_sequences):
    w = fidelity_weights()
    out = retain_fidelity(tiny_sequences).collect()
    assert len(out) == 10
    pdf = tiny_sequences.toPandas()
    for r in out:
        g = pdf[(pdf.user_id == r["entity_id"]) & (pdf.event_type == r["task"])]
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        logit, pred = numpy_retain_oracle(list(g.value), w)
        assert r["n_steps"] == len(g)
        np.testing.assert_allclose(r["logit"], round(logit, 6), rtol=1e-6)
        np.testing.assert_allclose(r["pred"], round(pred, 6), rtol=1e-6)


def test_fidelity_gru_matches_numpy_oracle(spark, tiny_sequences):
    """The GRU branch of the cell factory (model.py:109-111 default)."""
    w = fidelity_weights(cell="gru")
    out = retain_fidelity(tiny_sequences, cell="gru").collect()
    assert len(out) == 10
    pdf = tiny_sequences.toPandas()
    for r in out:
        g = pdf[(pdf.user_id == r["entity_id"]) & (pdf.event_type == r["task"])]
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        logit, pred = numpy_retain_oracle(list(g.value), w, cell="gru")
        np.testing.assert_allclose(r["logit"], round(logit, 6), rtol=1e-6)
        np.testing.assert_allclose(r["pred"], round(pred, 6), rtol=1e-6)


def test_fidelity_keep_prob_matches_numpy_oracle(spark, tiny_sequences):
    """Output dropout at keep_prob=0.5 (model.py:112-115, 204-207):
    deterministic mask, identical on both engines, and it must actually
    change the output vs keep_prob=1."""
    w = fidelity_weights()
    out = retain_fidelity(tiny_sequences, keep_prob=0.5).collect()
    pdf = tiny_sequences.toPandas()
    changed = 0
    for r in out:
        g = pdf[(pdf.user_id == r["entity_id"]) & (pdf.event_type == r["task"])]
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        logit, pred = numpy_retain_oracle(list(g.value), w, keep_prob=0.5)
        np.testing.assert_allclose(r["logit"], round(logit, 6), rtol=1e-6)
        base, _ = numpy_retain_oracle(list(g.value), w, keep_prob=1.0)
        changed += abs(base - logit) > 1e-9
    assert changed > 0


@pytest.mark.parametrize("cell", ["lstm", "gru"])
def test_fidelity_two_layer_stack_matches_numpy_oracle(spark, tiny_sequences, cell):
    """MultiRNNCell stacking (model.py:125-127): a 2-layer stack of
    either cell must match the independent numpy oracle, and must
    differ from the 1-layer output (the second layer genuinely runs)."""
    w = fidelity_weights(cell=cell, num_layers=2)
    out = retain_fidelity(tiny_sequences, cell=cell, num_layers=2).collect()
    assert len(out) == 10
    pdf = tiny_sequences.toPandas()
    w1 = fidelity_weights(cell=cell)
    differs = 0
    for r in out:
        g = pdf[(pdf.user_id == r["entity_id"]) & (pdf.event_type == r["task"])]
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        logit, pred = numpy_retain_oracle(list(g.value), w, cell=cell)
        np.testing.assert_allclose(r["logit"], round(logit, 6), rtol=1e-6)
        np.testing.assert_allclose(r["pred"], round(pred, 6), rtol=1e-6)
        one_layer, _ = numpy_retain_oracle(list(g.value), w1, cell=cell)
        differs += abs(one_layer - logit) > 1e-9
    assert differs > 0


def test_fidelity_reverse_time_matters(spark, tiny_sequences):
    """Reversing the sequence must change the output (the recurrence
    is genuinely order-sensitive — guards against a kernel that
    ignores time order)."""
    w = fidelity_weights()
    pdf = tiny_sequences.toPandas()
    g = pdf[(pdf.user_id == 0) & (pdf.event_type == "click")].sort_values("ts")
    fwd, _ = numpy_retain_oracle(list(g.value), w)
    rev, _ = numpy_retain_oracle(list(g.value)[::-1], w)
    assert abs(fwd - rev) > 1e-9
