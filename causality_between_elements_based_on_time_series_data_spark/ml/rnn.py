"""RNN-fidelity mode (SURVEY.md §2.5 recurrence row, milestone 5).

The reference runs an LSTM over each entity's reversed sequence and
derives RETAIN α/β attention from the hidden states
(``/root/reference/model.py:61-63, 70-78, 109-115, 131-147``).  Spark
has no recurrence primitive, so fidelity mode executes the exact
forward math as an Arrow-batched ``applyInPandas`` kernel: one group
per (entity, task), numpy inside, fixed deterministic weights.  The
lag-feature window path (queries_window.py) is the *idiomatic* port;
this mode exists to reproduce the reference's numerics, and is tested
against an independent numpy oracle (tests/test_rnn.py).

Scale note: groups are (entity, task)-partitioned — the same single
shuffle as every other sequence op here — and each group is tiny
(steps × features), so the kernel is embarrassingly parallel; Arrow
moves batches of groups per call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HID = 4  # hidden units (reference: 16, run.py:25 — smaller for tests)
EMB = 4  # embedding width (reference: V is 73×16, model.py:119)


def fidelity_weights(hid: int = HID, emb: int = EMB) -> dict[str, list]:
    """Deterministic weight set shared by the Spark kernel and the
    test oracle — the analog of the reference's fixed config/V/attention
    parameters (model.py:119-123, 150-151)."""

    def mat(rows: int, cols: int, salt: int) -> list[list[float]]:
        return [
            [(((r * 31 + c * 17 + salt * 13) % 101) / 101.0 - 0.5) * 0.6 for c in range(cols)]
            for r in range(rows)
        ]

    return {
        "V": mat(1, emb, 1),  # scalar value -> emb-dim embedding
        "Wx": mat(emb, 4 * hid, 2),  # LSTM input kernel  [i f g o]
        "Wh": mat(hid, 4 * hid, 3),  # LSTM recurrent kernel
        "b": [0.0] * (4 * hid),
        "w_alpha": mat(hid, 1, 4),  # α scorer (model.py:120-121)
        "b_alpha": [0.1],
        "W_beta": mat(hid, emb, 5),  # β gate (model.py:122-123)
        "b_beta": [0.05] * emb,
        "w_out": mat(emb, 1, 6),  # task head (model.py:150-151)
        "b_out": [0.0],
    }


def retain_fidelity(
    df: DataFrame,
    entity_col: str = "user_id",
    task_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
    weights: dict[str, list] | None = None,
) -> DataFrame:
    """Per (entity, task): embed each step, run the LSTM over the
    REVERSED sequence (model.py:138), score α (softmax over steps) and
    β (tanh gate) from hidden states, aggregate the context vector
    (model.py:147) and emit the task head's logit + prediction.

    The kernel closure is self-contained (numpy/pandas only — Spark
    workers cannot import this repo; see operators/multimodal.py).
    """
    w = weights or fidelity_weights()
    ocols = list(order_cols)

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        V = np.asarray(w["V"])
        Wx, Wh, b = np.asarray(w["Wx"]), np.asarray(w["Wh"]), np.asarray(w["b"])
        w_a, b_a = np.asarray(w["w_alpha"]), np.asarray(w["b_alpha"])
        W_b, b_b = np.asarray(w["W_beta"]), np.asarray(w["b_beta"])
        w_o, b_o = np.asarray(w["w_out"]), np.asarray(w["b_out"])
        hid = Wh.shape[0]

        pdf = pdf.sort_values(ocols, kind="mergesort")
        x = pdf["value"].to_numpy(dtype=np.float64)[:, None]  # [T, 1]
        emb = x @ V  # per-step embedding (model.py:132)
        rev = emb[::-1]  # reverse time (model.py:138)

        h = np.zeros(hid)
        c = np.zeros(hid)
        hs = np.empty((len(rev), hid))
        for t, v in enumerate(rev):  # dynamic_rnn (model.py:61-63)
            gates = v @ Wx + h @ Wh + b
            i, f, g, o = np.split(gates, 4)
            i, f, o = 1 / (1 + np.exp(-i)), 1 / (1 + np.exp(-f)), 1 / (1 + np.exp(-o))
            c = f * c + i * np.tanh(g)
            h = o * np.tanh(c)
            hs[t] = h
        hs = hs[::-1]  # attentions flipped back (model.py:142-144)

        score = hs @ w_a + b_a  # [T, 1]
        score = score - score.max()
        alpha = np.exp(score) / np.exp(score).sum()  # softmax (model.py:75)
        beta = np.tanh(hs @ W_b + b_b)  # [T, emb]   (model.py:77-78)
        ctx = (alpha * beta * emb).sum(axis=0)  # context  (model.py:147)
        logit = float(ctx @ w_o + b_o)
        return pd.DataFrame(
            {
                "entity_id": [int(pdf.iloc[0]["__entity"])],
                "task": [pdf.iloc[0]["__task"]],
                "n_steps": [len(x)],
                "logit": [round(logit, 6)],
                "pred": [round(1 / (1 + np.exp(-logit)), 6)],
            }
        )

    prepared = df.select(
        F.col(entity_col).alias("__entity"),
        F.col(task_col).alias("__task"),
        *[F.col(c) for c in ocols],
        F.col(value_col).alias("value"),
    )
    return prepared.groupBy("__entity", "__task").applyInPandas(
        kernel, schema="entity_id long, task string, n_steps long, logit double, pred double"
    )
