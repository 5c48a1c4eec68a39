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


def fidelity_weights(
    hid: int = HID, emb: int = EMB, cell: str = "lstm", num_layers: int = 1
) -> dict[str, list]:
    """Deterministic weight set shared by the Spark kernel and the
    test oracle — the analog of the reference's fixed config/V/attention
    parameters (model.py:119-123, 150-151).  ``cell`` sizes the
    recurrent kernels: 4·hid gates for LSTM ([i f g o]), 3·hid for GRU
    ([r u c]) — mirroring the reference's cell factory
    (model.py:109-115: GRUCell by default, LSTM when ``use_lstm``).
    ``num_layers`` mirrors the MultiRNNCell stacking (model.py:125-127):
    layer 0 consumes the embedding, layers ≥ 1 consume the previous
    layer's (dropout-applied) output, so extra layers get hid-wide
    input kernels under ``extra_layers``."""

    gates = 4 if cell == "lstm" else 3

    def mat(rows: int, cols: int, salt: int) -> list[list[float]]:
        return [
            [(((r * 31 + c * 17 + salt * 13) % 101) / 101.0 - 0.5) * 0.6 for c in range(cols)]
            for r in range(rows)
        ]

    return {
        "V": mat(1, emb, 1),  # scalar value -> emb-dim embedding
        "Wx": mat(emb, gates * hid, 2),  # recurrent input kernel
        "Wh": mat(hid, gates * hid, 3),  # recurrent state kernel
        "b": [0.0] * (gates * hid),
        "extra_layers": [
            {
                "Wx": mat(hid, gates * hid, 7 + 3 * li),
                "Wh": mat(hid, gates * hid, 8 + 3 * li),
                "b": [0.0] * (gates * hid),
            }
            for li in range(num_layers - 1)
        ],
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
    cell: str = "lstm",
    keep_prob: float = 1.0,
    dropout_seed: int = 13,
    num_layers: int = 1,
) -> DataFrame:
    """Per (entity, task): embed each step, run the recurrent cell over
    the REVERSED sequence (model.py:138), score α (softmax over steps)
    and β (tanh gate) from hidden states, aggregate the context vector
    (model.py:147) and emit the task head's logit + prediction.

    ``cell`` selects the recurrence, matching the reference's cell
    factory (model.py:109-115): ``'lstm'`` (the dropout-wrapped
    ``use_lstm`` branch) or ``'gru'`` (the default branch — TF GRUCell
    math: joint [r u] sigmoid gates, candidate tanh over r-gated
    state, h' = u·h + (1−u)·c).

    ``num_layers`` mirrors the MultiRNNCell stacking (model.py:
    125-127): each layer is the same cell kind with its own kernels;
    layer l ≥ 1 consumes layer l−1's *output-dropout-applied* hidden
    state (the DropoutWrapper sits inside the stack, as in the
    reference's wrap-then-stack construction), and the attention reads
    the top layer's outputs.  The shipped config is ``num_layers=1``
    (run.py:24).

    ``keep_prob`` reproduces the DropoutWrapper's *output* dropout
    (model.py:112-115; 0.5 at train, 1.0 at eval — model.py:204-207):
    the recurrent state flows un-dropped, only the emitted hidden
    states (the attention inputs) are masked and 1/keep_prob-scaled.
    Fidelity mode needs reproducible numerics across batching and
    engines, so the mask is a deterministic hash of (reversed step,
    unit, dropout_seed) rather than a stateful RNG draw — the numpy
    oracle in tests/test_rnn.py applies the identical mask.

    The kernel closure is self-contained (numpy/pandas only — Spark
    workers cannot import this repo; see operators/multimodal.py).

    Execution shape: sequences are first materialized per (entity,
    task) with ``array_sort(collect_list(...))`` (one shuffle), then a
    ``mapInPandas`` kernel runs the LSTM *vectorized across the whole
    Arrow batch* with end-padding + masking.  The per-group
    ``applyInPandas`` formulation pays Python dispatch per group
    (~16 s for 7.5k groups at sf0.1); batching brings it to ~one call
    per partition with the recurrence looping only over max sequence
    length.  The padded positions contribute nothing: α is masked to
    0 and the padded embeddings are 0.
    """
    w = weights or fidelity_weights(cell=cell, num_layers=num_layers)
    ocols = list(order_cols)
    cell_kind = cell
    kp, seed = float(keep_prob), int(dropout_seed)

    def kernel(batches):
        import numpy as np
        import pandas as pd

        V = np.asarray(w["V"])
        layers = [(np.asarray(w["Wx"]), np.asarray(w["Wh"]), np.asarray(w["b"]))] + [
            (np.asarray(x["Wx"]), np.asarray(x["Wh"]), np.asarray(x["b"]))
            for x in w.get("extra_layers", [])
        ]
        w_a, b_a = np.asarray(w["w_alpha"]), np.asarray(w["b_alpha"])
        W_b, b_b = np.asarray(w["W_beta"]), np.asarray(w["b_beta"])
        w_o, b_o = np.asarray(w["w_out"]), np.asarray(w["b_out"])
        hid = layers[0][1].shape[0]

        def sig(a):
            return 1.0 / (1.0 + np.exp(-a))

        def drop_mask(t, li):
            # deterministic per-(reversed step, unit, layer) output-
            # dropout mask, batch-shape independent (layer-0 term is 0,
            # preserving the single-layer mask exactly)
            units = np.arange(hid)
            keep = (
                (t * 2654435761 + units * 40503 + seed * 97 + li * 7919) % 1000
            ) < kp * 1000
            return np.where(keep, 1.0 / kp, 0.0)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            seqs = [np.asarray(v, dtype=np.float64) for v in pdf["vals"]]
            lens = np.array([len(s) for s in seqs])
            B, T = len(seqs), int(lens.max())
            X = np.zeros((B, T))
            for i, s in enumerate(seqs):
                X[i, : lens[i]] = s[::-1]  # reverse time (model.py:138), pad at end
            mask = np.arange(T)[None, :] < lens[:, None]  # [B, T]

            emb = X[..., None] * V[0][None, None, :]  # embedding (model.py:132) [B,T,E]
            Hst = [np.zeros((B, hid)) for _ in layers]
            Cst = [np.zeros((B, hid)) for _ in layers]
            HS = np.zeros((B, T, hid))
            for t in range(T):  # dynamic_rnn (model.py:61-63), batch-wide
                m = mask[:, t : t + 1]
                inp = emb[:, t, :]  # layer stack (MultiRNNCell, model.py:125-127)
                for li, (Wx_l, Wh_l, b_l) in enumerate(layers):
                    h = Hst[li]
                    if cell_kind == "gru":
                        zr = sig(
                            inp @ Wx_l[:, : 2 * hid] + h @ Wh_l[:, : 2 * hid] + b_l[: 2 * hid]
                        )
                        r_, u_ = np.split(zr, 2, axis=1)
                        cand = np.tanh(
                            inp @ Wx_l[:, 2 * hid :]
                            + (r_ * h) @ Wh_l[:, 2 * hid :]
                            + b_l[2 * hid :]
                        )
                        h_new = u_ * h + (1.0 - u_) * cand
                    else:
                        gates = inp @ Wx_l + h @ Wh_l + b_l
                        i_, f_, g_, o_ = np.split(gates, 4, axis=1)
                        c_new = sig(f_) * Cst[li] + sig(i_) * np.tanh(g_)
                        h_new = sig(o_) * np.tanh(c_new)
                        Cst[li] = np.where(m, c_new, Cst[li])
                    Hst[li] = np.where(m, h_new, h)
                    # next layer consumes the dropout-applied output
                    inp = h_new if kp >= 1.0 else h_new * drop_mask(t, li)[None, :]
                HS[:, t, :] = np.where(m, inp, 0.0)

            # α softmax over valid steps (model.py:70-75); the context
            # sum is position-aligned in reversed coordinates, and a
            # sum is order-invariant, so no un-reversing is needed.
            score = HS @ w_a + b_a  # [B,T,1]
            score = np.where(mask[..., None], score, -np.inf)
            score = score - score.max(axis=1, keepdims=True)
            e = np.where(mask[..., None], np.exp(score), 0.0)
            alpha = e / e.sum(axis=1, keepdims=True)
            beta = np.tanh(HS @ W_b + b_b)  # β gate (model.py:77-78)
            ctx = (alpha * beta * emb).sum(axis=1)  # context (model.py:147)
            logit = (ctx @ w_o).ravel() + b_o[0]
            pred = sig(logit)
            yield pd.DataFrame(
                {
                    "entity_id": pdf["__entity"].astype("int64"),
                    "task": pdf["__task"],
                    "n_steps": lens.astype("int64"),
                    "logit": np.round(logit, 6),
                    "pred": np.round(pred, 6),
                }
            )

    seq_struct = F.array_sort(
        F.collect_list(F.struct(*[F.col(c).alias(f"o{i}") for i, c in enumerate(ocols)], F.col(value_col).alias("v")))
    )
    prepared = (
        df.select(
            F.col(entity_col).alias("__entity"),
            F.col(task_col).alias("__task"),
            *[F.col(c) for c in ocols],
            F.col(value_col),
        )
        .groupBy("__entity", "__task")
        .agg(F.transform(seq_struct, lambda x: x["v"]).alias("vals"))
    )
    return prepared.mapInPandas(
        kernel, schema="entity_id long, task string, n_steps long, logit double, pred double"
    )
