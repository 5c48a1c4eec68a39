"""Scalar function surface (SURVEY.md §2.8).

Covers every scalar the reference uses, as Catalyst Column expressions
(JVM-side, whole-stage-codegen friendly — never row-at-a-time Python):

- sigmoid            — ``/root/reference/model.py:154`` (tf.sigmoid)
- sigmoid_cross_entropy — ``model.py:159`` in the numerically-stable
  form TF documents: ``max(z,0) - z*y + log1p(exp(-|z|))``.
- softmax_over       — ``model.py:75`` softmax over the time axis,
  re-expressed as a window-normalized aggregate:
  ``exp(x - max(x) over w) / sum(exp(x - max(x) over w)) over w``
  (max-shifted for overflow stability; invariant to the shift).
"""

from __future__ import annotations

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F


def sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def sigmoid_cross_entropy(z: Column, y: Column) -> Column:
    """Stable sigmoid cross-entropy with logits (TF semantics)."""
    return F.greatest(z, F.lit(0.0)) - z * y + F.log1p(F.exp(-F.abs(z)))


def softmax_over(x: Column, w: WindowSpec) -> Column:
    """Softmax of ``x`` normalized within window ``w`` (α-attention core)."""
    shifted = F.exp(x - F.max(x).over(w))
    return shifted / F.sum(shifted).over(w)
