"""Property tests for the bucket+offset exact-rank device
(``operators/ranks.py``) — load-bearing under 15+ registry queries
since round 9, so its equivalence to the literal global window is
pinned directly here, not only through those queries' oracles.

The literal global windows used as the EXPECTED side are fine in this
file: the test relations are a few hundred rows (the gate in
``test_plans.py`` forbids them in product plans, not in tests).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from causality_between_elements_based_on_time_series_data_spark.operators.ranks import (
    topk_ranked,
    with_global_cumsum,
    with_global_rank,
    with_range_bucket,
)


def _fixture(spark, n=500, all_equal=False):
    """n rows with a skewed, tie-heavy numeric value and a unique id
    tiebreak; deterministic (no rand())."""
    df = spark.range(n).select(
        F.col("id").alias("uid"),
        (
            F.lit(7.0)
            if all_equal
            # quadratic-ish growth + heavy ties from the modulus
            else ((F.col("id") % 17) * (F.col("id") % 17)
                  + (F.col("id") % 5)).cast("double")
        ).alias("val"),
    )
    return df


def _expected_rank(df, descending=False):
    order = [F.desc("val"), F.asc("uid")] if descending else [
        F.asc("val"), F.asc("uid")
    ]
    return df.withColumn(
        "exp", F.row_number().over(Window.orderBy(*order))
    )


def _assert_same(got, exp, key="uid", col_got="rn", col_exp="exp"):
    joined = got.select(key, col_got).join(
        exp.select(key, col_exp), key
    )
    bad = joined.filter(F.col(col_got) != F.col(col_exp)).count()
    assert bad == 0, f"{bad} mismatching rows"


def test_global_rank_matches_literal_window_asc(spark):
    df = _fixture(spark)
    got = with_global_rank(
        with_range_bucket(df, "val"), [F.asc("val"), F.asc("uid")]
    )
    _assert_same(got, _expected_rank(df))


def test_global_rank_matches_literal_window_desc(spark):
    df = _fixture(spark)
    got = with_global_rank(
        with_range_bucket(df, "val", descending=True),
        [F.desc("val"), F.asc("uid")],
    )
    _assert_same(got, _expected_rank(df, descending=True))


def test_global_rank_degenerate_all_equal_values(spark):
    # span = 0 -> every row lands in bucket 0; ranks still exact
    df = _fixture(spark, n=50, all_equal=True)
    got = with_global_rank(
        with_range_bucket(df, "val"), [F.asc("val"), F.asc("uid")]
    )
    _assert_same(got, _expected_rank(df))


def test_global_rank_single_row_and_total(spark):
    df = _fixture(spark, n=1)
    got = with_global_rank(
        with_range_bucket(df, "val"),
        [F.asc("val"), F.asc("uid")],
        total="ntot",
    ).collect()
    assert len(got) == 1 and got[0]["rn"] == 1 and got[0]["ntot"] == 1


def test_global_rank_total_equals_count(spark):
    df = _fixture(spark, n=137)
    got = with_global_rank(
        with_range_bucket(df, "val"),
        [F.asc("val"), F.asc("uid")],
        total="ntot",
    )
    rows = got.select("ntot").distinct().collect()
    assert [r["ntot"] for r in rows] == [137]


def test_partitioned_rank_matches_literal_window(spark):
    df = _fixture(spark).withColumn("grp", (F.col("uid") % 3).cast("int"))
    got = with_global_rank(
        with_range_bucket(df, "val"),
        [F.asc("val"), F.asc("uid")],
        partition_by=("grp",),
        total="cnt",
    )
    w = Window.partitionBy("grp").orderBy(F.asc("val"), F.asc("uid"))
    exp = df.withColumn("exp", F.row_number().over(w))
    _assert_same(got, exp)
    # per-group total: cnt must equal the group size everywhere
    bad = (
        got.groupBy("grp")
        .agg(F.count("*").alias("n"), F.max("cnt").alias("mx"),
             F.min("cnt").alias("mn"))
        .filter((F.col("n") != F.col("mx")) | (F.col("n") != F.col("mn")))
        .count()
    )
    assert bad == 0


def test_global_cumsum_matches_literal_window(spark):
    df = _fixture(spark).withColumn("w8", (F.col("uid") % 7).cast("bigint"))
    # order strictly by val would be ambiguous under ties for a SUM of
    # per-row weights; the device orders identically to the literal
    # window when the order is total, so include the uid tiebreak
    got = with_global_cumsum(
        with_range_bucket(df, "val"),
        [F.asc("val"), F.asc("uid")],
        {"w8": "cum"},
    )
    w = Window.orderBy(F.asc("val"), F.asc("uid")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exp = df.withColumn("exp", F.sum("w8").over(w))
    _assert_same(got, exp, col_got="cum")


def test_topk_ranked_matches_sorted_head(spark):
    df = _fixture(spark)
    got = {
        (r["uid"], r["rnk"])
        for r in topk_ranked(
            df, [("val", "desc"), ("uid", "asc")], 25
        ).collect()
    }
    exp = {
        (r["uid"], i + 1)
        for i, r in enumerate(
            df.orderBy(F.desc("val"), F.asc("uid")).limit(25).collect()
        )
    }
    assert got == exp


def test_topk_ranked_k_larger_than_relation(spark):
    df = _fixture(spark, n=9)
    rows = topk_ranked(df, [("val", "asc"), ("uid", "asc")], 25).collect()
    assert sorted(r["rnk"] for r in rows) == list(range(1, 10))


def test_global_rank_null_keys_match_literal_window_asc(spark):
    # round-10 hardening: null sort keys must RANK (nulls-first under
    # ASC, like the literal window), not silently drop at the offset
    # join — the round-9 advice defect.
    df = _fixture(spark, n=200).withColumn(
        "val", F.when(F.col("uid") % 11 == 0, F.lit(None)).otherwise(F.col("val"))
    )
    got = with_global_rank(
        with_range_bucket(df, "val"), [F.asc("val"), F.asc("uid")]
    )
    assert got.count() == 200  # nothing dropped
    _assert_same(got, _expected_rank(df))


def test_global_rank_null_keys_match_literal_window_desc(spark):
    # DESC = NULLS LAST in Spark; the null bucket must sort last
    df = _fixture(spark, n=200).withColumn(
        "val", F.when(F.col("uid") % 13 == 0, F.lit(None)).otherwise(F.col("val"))
    )
    got = with_global_rank(
        with_range_bucket(df, "val", descending=True),
        [F.desc("val"), F.asc("uid")],
    )
    assert got.count() == 200
    _assert_same(got, _expected_rank(df, descending=True))


def test_global_cumsum_null_keys_match_literal_window(spark):
    df = _fixture(spark, n=150).withColumn(
        "val", F.when(F.col("uid") % 9 == 0, F.lit(None)).otherwise(F.col("val"))
    ).withColumn("w8", (F.col("uid") % 7).cast("bigint"))
    got = with_global_cumsum(
        with_range_bucket(df, "val"),
        [F.asc("val"), F.asc("uid")],
        {"w8": "cum"},
    )
    w = Window.orderBy(F.asc("val"), F.asc("uid")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exp = df.withColumn("exp", F.sum("w8").over(w))
    assert got.count() == 150
    _assert_same(got, exp, col_got="cum")


def test_topk_ranked_duplicate_rows_kept_with_tied_ranks(spark):
    # round-10 hardening: fully-duplicate rows (total-order contract
    # violated) must degrade to rank() semantics — all k rows kept,
    # ties share a rank — instead of silently collapsing below k.
    df = spark.range(6).select(
        (F.col("id") % 3).cast("double").alias("val")
    )  # values 0,1,2 each twice; no tiebreak column on purpose
    rows = topk_ranked(df, [("val", "desc")], 4).collect()
    assert len(rows) == 4
    ranks = sorted((r["val"], r["rnk"]) for r in rows)
    assert ranks == [(1.0, 3), (1.0, 3), (2.0, 1), (2.0, 1)]


def test_topk_ranked_null_in_key_column_counts_correctly(spark):
    # the match count uses a join marker, not the first key column, so
    # a null key in a matched row cannot undercount the rank
    df = spark.createDataFrame(
        [(None, 1), (5.0, 2), (3.0, 3)], ["val", "uid"]
    )
    rows = topk_ranked(df, [("val", "desc"), ("uid", "asc")], 3).collect()
    by_uid = {r["uid"]: r["rnk"] for r in rows}
    # DESC sorts nulls last: 5.0, 3.0, then null
    assert by_uid == {2: 1, 3: 2, 1: 3}


def test_range_bucket_is_monotone_and_non_null(spark):
    df = with_range_bucket(_fixture(spark), "val")
    # bucket must be a monotone function of the value: max bucket of
    # any lower value <= min bucket of any higher value
    per_val = df.groupBy("val").agg(
        F.min("bkt").alias("lo"), F.max("bkt").alias("hi")
    )
    assert per_val.filter(F.col("lo") != F.col("hi")).count() == 0
    w = Window.orderBy("val")
    breaks = (
        per_val.withColumn("prev_hi", F.lag("hi").over(w))
        .filter(F.col("prev_hi").isNotNull() & (F.col("lo") < F.col("prev_hi")))
        .count()
    )
    assert breaks == 0
    assert df.filter(F.col("bkt").isNull()).count() == 0


# ---------------------------------------------------------------------------
# Hot-cell subsplit (round 11, VERDICT r10 #6): constant-key cells —
# which the primary range bucket CANNOT split without breaking rank
# exactness — are split by a tiebreak-range sub-bucket, bit-identical
# to the literal window.
# ---------------------------------------------------------------------------

from causality_between_elements_based_on_time_series_data_spark.operators.ranks import (  # noqa: E402
    with_hot_cell_subsplit,
)


def _grouped_pathological(spark):
    """Three groups: `mega` has one CONSTANT value for 400 rows (the
    single-bucket mega-domain pathology), `vary` has ordinary spread,
    `nulls` has null values and null tiebreaks mixed in."""
    base = spark.range(600).select(
        F.col("id").alias("uid"),
        F.when(F.col("id") < 400, F.lit("mega"))
        .when(F.col("id") < 550, F.lit("vary"))
        .otherwise(F.lit("nulls"))
        .alias("grp"),
        F.when(F.col("id") < 400, F.lit(42.0))
        .when(F.col("id") < 550, (F.col("id") % 23).cast("double"))
        .when(F.col("id") % 3 == 0, F.lit(None).cast("double"))
        .otherwise(F.lit(7.0))
        .alias("val"),
        F.when(
            (F.col("id") >= 550) & (F.col("id") % 4 == 0),
            F.lit(None).cast("bigint"),
        )
        .otherwise((F.col("id") * 37) % 601)
        .alias("tb"),
    )
    return base


def test_subsplit_constant_group_bit_identical_and_split(spark):
    df = _grouped_pathological(spark)
    b = with_range_bucket(df, "val")
    b2 = with_hot_cell_subsplit(
        b, "val", "tb", group_by=("grp",), broadcast_stats=True
    )
    got = with_global_rank(
        b2,
        [F.asc("val"), F.asc("tb"), F.asc("uid")],
        bucket_col="bkt2",
        partition_by=("grp",),
        broadcast_offsets=True,
    )
    w = Window.partitionBy("grp").orderBy(
        F.asc("val"), F.asc("tb"), F.asc("uid")
    )
    exp = df.withColumn("exp", F.row_number().over(w))
    _assert_same(got, exp)
    # the pathology is actually split: the mega group's 400
    # constant-value rows occupy >1 composite bucket
    n_cells = (
        b2.filter(F.col("grp") == "mega").select("bkt2").distinct().count()
    )
    assert n_cells > 1, "constant-key cell was not subsplit"


def test_subsplit_descending_tiebreak_bit_identical(spark):
    df = _grouped_pathological(spark)
    b = with_range_bucket(df, "val", descending=True)
    b2 = with_hot_cell_subsplit(
        b,
        "val",
        "tb",
        group_by=("grp",),
        tiebreak_descending=True,
        broadcast_stats=True,
    )
    got = with_global_rank(
        b2,
        [F.desc("val"), F.desc("tb"), F.asc("uid")],
        bucket_col="bkt2",
        partition_by=("grp",),
        broadcast_offsets=True,
    )
    w = Window.partitionBy("grp").orderBy(
        F.desc("val"), F.desc("tb"), F.asc("uid")
    )
    exp = df.withColumn("exp", F.row_number().over(w))
    _assert_same(got, exp)
    # the descending split must ACTUALLY split (a draft negated the
    # tiebreak span for desc, making every desc cell fall back to the
    # no-split sub-bucket — bit-identical but a straggler no-op)
    n_cells = (
        b2.filter(F.col("grp") == "mega").select("bkt2").distinct().count()
    )
    assert n_cells > 1, "descending constant-key cell was not subsplit"


def test_subsplit_ungrouped_all_equal_values(spark):
    # global rank where EVERY value is identical: without the
    # subsplit this is one window task; with it, ranks still match
    # the literal window exactly
    df = _fixture(spark, all_equal=True)
    b = with_range_bucket(df, "val")
    b2 = with_hot_cell_subsplit(b, "val", "uid")
    got = with_global_rank(
        b2, [F.asc("val"), F.asc("uid")], bucket_col="bkt2"
    )
    exp = _expected_rank(df)
    _assert_same(got, exp)
    assert b2.select("bkt2").distinct().count() > 1


def test_subsplit_is_noop_refinement_on_varying_cells(spark):
    # ordinary spread data: subsplit must not perturb ranks either
    df = _fixture(spark)
    b = with_range_bucket(df, "val")
    b2 = with_hot_cell_subsplit(b, "val", "uid")
    got = with_global_rank(
        b2, [F.asc("val"), F.asc("uid")], bucket_col="bkt2"
    )
    _assert_same(got, _expected_rank(df))


def test_pre_shuffle_rank_bit_identical_and_single_fact_exchange(spark):
    """The r16 fused device (pre_shuffle=True) must (a) return exactly
    the literal global window's ranks in both grouped and ungrouped
    mode, and (b) plan the fact through ONE explicit hash
    repartition on (grp..., bkt) that both device consumers reuse —
    no second fact-sized Exchange from the counts aggregate."""
    import re

    df = _fixture(spark).withColumn("grp", (F.col("uid") % 3).cast("int"))
    for grp in ((), ("grp",)):
        got = with_global_rank(
            with_range_bucket(df, "val"),
            [F.asc("val"), F.asc("uid")],
            partition_by=grp,
            pre_shuffle=True,
        )
        w = (
            Window.partitionBy(*grp) if grp else Window.partitionBy(F.lit(1))
        ).orderBy(F.asc("val"), F.asc("uid"))
        exp = df.withColumn("exp", F.row_number().over(w))
        _assert_same(got, exp)
    # plan shape: the only exchanges hash-partitioned on the full
    # (grp, bkt) key are the single explicit repartition (printed once
    # per consumer pre-execution; ReusedExchange dedups at runtime) —
    # the counts aggregate must NOT introduce its own differently-
    # shaped fact exchange (it hangs off the same repartition).
    fused = with_global_rank(
        with_range_bucket(df, "val"),
        [F.asc("val"), F.asc("uid")],
        partition_by=("grp",),
        pre_shuffle=True,
    )
    plan = fused._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    fact_ex = re.findall(r"hashpartitioning\(grp#\d+, bkt#\d+", plan)
    assert fact_ex, plan  # the explicit repartition is present
    # every fact exchange is that same (grp, bkt) repartition — the
    # canonical-identical subtrees dedup to one executed stage
    assert "REPARTITION_BY_COL" in plan, plan
