"""Scalar-function stability tests (hypothesis-driven): the stable
sigmoid-CE form must stay finite and match a float128-ish reference at
extreme logits; softmax must stay normalized under extreme shifts.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from causality_between_elements_based_on_time_series_data_spark.functions.scalar import (
    sigmoid,
    sigmoid_cross_entropy,
    softmax_over,
)


@pytest.fixture(scope="module")
def eval_scalar(spark):
    def run(z: float, y: float) -> dict:
        df = spark.createDataFrame([(z, y)], "z double, y double")
        row = df.select(
            sigmoid(F.col("z")).alias("sig"),
            sigmoid_cross_entropy(F.col("z"), F.col("y")).alias("ce"),
        ).first()
        return {"sig": row["sig"], "ce": row["ce"]}

    return run


@settings(max_examples=15, deadline=None)
@given(
    z=st.floats(min_value=-500, max_value=500, allow_nan=False),
    y=st.sampled_from([0.0, 1.0]),
)
def test_sigmoid_ce_stable_and_correct(eval_scalar, z, y):
    out = eval_scalar(z, y)
    assert math.isfinite(out["ce"]), f"CE not finite at z={z}"
    assert out["ce"] >= 0.0
    # reference value via numpy in high precision
    ref = float(np.maximum(z, 0) - z * y + np.log1p(np.exp(-abs(z))))
    assert math.isclose(out["ce"], ref, rel_tol=1e-9, abs_tol=1e-12)
    assert 0.0 <= out["sig"] <= 1.0


def test_softmax_extreme_values_normalized(spark):
    # values that would overflow a naive exp(): max-shifting must save it
    rows = [(1, 700.0), (1, 710.0), (1, -800.0), (2, 0.0)]
    df = spark.createDataFrame(rows, "g int, v double")
    out = (
        df.select("g", softmax_over(F.col("v"), W.partitionBy("g")).alias("a"))
        .groupBy("g")
        .agg(F.sum("a").alias("s"))
        .collect()
    )
    sums = {r["g"]: r["s"] for r in out}
    assert math.isclose(sums[1], 1.0, rel_tol=1e-9)
    assert math.isclose(sums[2], 1.0, rel_tol=1e-9)


def test_approx_distinct_within_tolerance(spark, sf_dir):
    from causality_between_elements_based_on_time_series_data_spark.plans import REGISTRY
    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table,
    )

    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in REGISTRY["sketch_approx_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.05, (k, approx[k], n)


def test_redact_pii_crafted_edges(spark):
    from causality_between_elements_based_on_time_series_data_spark.functions.text import (
        redact_pii,
    )

    rows = [
        ("plain text no pii",),
        ("mail me at a.b-c+d@sub.example.co.uk today",),
        ("dial 555-123-4567 now",),
        ("link https://ex.com/p?q=1&r=2 trailing",),
        # an email inside a URL must be swallowed by the URL pass,
        # not half-redacted by the email pass
        ("see https://ex.com/mailto/a@b.com done",),
        ("combo x@y.io 111-222-3333 http://z.dev end",),
    ]
    df = spark.createDataFrame(rows, "text string")
    out = [r["clean"] for r in df.select(redact_pii(F.col("text")).alias("clean")).collect()]
    assert out[0] == "plain text no pii"
    assert out[1] == "mail me at <EMAIL> today"
    assert out[2] == "dial <PHONE> now"
    assert out[3] == "link <URL> trailing"
    assert out[4] == "see <URL> done"
    assert out[5] == "combo <EMAIL> <PHONE> <URL> end"
