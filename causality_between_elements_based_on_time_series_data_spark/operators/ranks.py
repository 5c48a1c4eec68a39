"""Distributed exact global ranks — the bucket+offset device.

Spark evaluates an unpartitioned window (``Window.orderBy(...)`` with
no ``partitionBy``) by moving EVERY row to one task: a one-task sort
that caps the whole query at single-core speed at 100 TB, however
correct the answer.  The device used across this repo's plans (first
proven in ``plans/queries_experiments.py`` ``propensity_stratified_
effect``) replaces it with three bounded pieces:

1. bucket every row by a MONOTONE function of the sort key (value-range
   buckets from a 1-row broadcast min/max — no eager action);
2. rank within each bucket with an ordinary distributed window;
3. add the tiny (≤ n_buckets-row) bucket-count table's cumulative
   prefix offsets, broadcast back.

The result is bit-identical to the literal global ``row_number()``
because bucket order refines the sort order (equal keys share a
bucket).  Skewed keys make hot buckets — a straggler on a LINEAR
window, never a blow-up.

These helpers are driver-side plan builders (plain DataFrame ops), not
worker-shipped closures, so importing package symbols here is safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..lineage import ckpt

N_BUCKETS = 128


def with_range_bucket(
    df: DataFrame,
    value_col: str,
    *,
    descending: bool = False,
    out: str = "bkt",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Add an integer bucket column that ascends in the requested sort
    order of ``value_col`` (any numeric type): equal values share a
    bucket, and bucket index is monotone in the sort order, so
    ``(bkt, value_col, tiebreaks...)`` sorts identically to
    ``(value_col, tiebreaks...)``.  Bounds come from a 1-row broadcast
    min/max aggregate — no eager action.  Double arithmetic is order-
    preserving (monotone ops compose), so one float path serves ints
    and doubles alike.

    Null ``value_col`` rows get their OWN bucket placed exactly where
    Spark's window sort would place them — ``-1`` ascending (ASC =
    NULLS FIRST) or ``n_buckets`` descending (DESC = NULLS LAST) — so
    downstream ``with_global_rank``/``with_global_cumsum`` equi-joins
    keep the rows and rank them bit-identically to the literal global
    window.  (Before round 10, null keys produced a null bucket and
    the offset join silently DROPPED the rows — the round-9 advice
    defect; callers no longer need to pre-coalesce.)
    """
    bounds = df.agg(
        F.min(value_col).alias("_rb_mn"), F.max(value_col).alias("_rb_mx")
    )
    v = F.col(value_col).cast("double")
    mn = F.col("_rb_mn").cast("double")
    mx = F.col("_rb_mx").cast("double")
    span = mx - mn
    pos = (mx - v) if descending else (v - mn)
    null_bkt = F.lit(n_buckets if descending else -1)
    bkt = F.when(v.isNull(), null_bkt).otherwise(
        F.when(
            span > 0,
            F.least(
                F.floor(pos * float(n_buckets) / span), F.lit(n_buckets - 1)
            ),
        ).otherwise(F.lit(0))
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out, bkt.cast("int"))
        .drop("_rb_mn", "_rb_mx")
    )


def with_global_rank(
    df: DataFrame,
    order_by: list[Column],
    *,
    bucket_col: str = "bkt",
    out: str = "rn",
    total: str | None = None,
    partition_by: tuple[str, ...] = (),
    broadcast_offsets: bool | None = None,
    pre_shuffle: bool = False,
) -> DataFrame:
    """Exact ``row_number()`` over ``order_by`` given a bucket column
    that ascends in that order (see ``with_range_bucket``): per-bucket
    distributed windows + the ≤ n_buckets-row count table's cumulative
    offsets, broadcast back.  ``total`` optionally adds the overall
    row count (from the same tiny table — no extra pass over ``df``).
    ``partition_by`` restarts the rank per group (``PARTITION BY grp
    ORDER BY ...`` semantics — the offset/count table then has ≤
    |groups|·n_buckets rows, and ``total`` becomes the per-group
    count).  The input should be cached/checkpointed by the caller if
    recomputing it twice (counts + ranks) is expensive.

    Offset-table join strategy (round-11, VERDICT r10 #1): the
    ungrouped table is ≤ n_buckets rows BY CONSTRUCTION, so it is
    force-broadcast.  The grouped table is ≤ |groups|·n_buckets rows —
    bounded only by the GROUP DOMAIN, which for keys like web domains
    is 10⁷–10⁸ at crawl scale, i.e. a multi-GB force-broadcast that
    OOMs every executor.  Grouped mode therefore joins the offsets
    with a plain shuffled equi-join on ``(grp…, bkt)`` — both sides
    are already keyed, and AQE upgrades it to a runtime broadcast
    whenever the table is actually tiny (2 arms, |langs|).
    ``broadcast_offsets`` overrides the auto choice for callers that
    KNOW their group domain is bounded.

    ``pre_shuffle=True`` (the r16 fused form, guide §2.4 "two
    operations keyed the same way can share one exchange"): the input
    is explicitly hash-repartitioned on ``(partition_by…, bucket_col)``
    FIRST, so the device's two consumers — the bucket-count aggregate
    and the rank window — hang off ONE identical Exchange subtree that
    physical planning deduplicates (ReusedExchange): the input lineage
    executes once and the fact crosses the network once, instead of
    twice (the agg's exchange + the window's exchange) from a
    caller-materialized checkpoint.  Callers that only checkpointed
    the bucketed input to stop the device re-deriving it can drop that
    cut.  Results are bit-identical (partitioning never affects the
    per-(grp, bkt) window or counts).
    """
    grp = list(partition_by)
    if pre_shuffle:
        df = df.repartition(*grp, bucket_col)
    counts = df.groupBy(*grp, bucket_col).agg(
        F.count("*").alias("_gr_cnt")
    )
    # tiny (≤ |groups|·n_buckets-row) table: global windows are fine HERE
    woff = Window.partitionBy(*grp).orderBy(bucket_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = counts.select(
        *grp,
        bucket_col,
        F.coalesce(F.sum("_gr_cnt").over(woff), F.lit(0)).alias("_gr_off"),
        *(
            [
                F.sum("_gr_cnt")
                .over(
                    Window.partitionBy(*grp)
                    if grp
                    else Window.partitionBy(F.lit(1))
                )
                .alias(total)
            ]
            if total
            else []
        ),
    )
    wb = Window.partitionBy(*grp, bucket_col).orderBy(*order_by)
    if broadcast_offsets is None:
        broadcast_offsets = not grp  # ungrouped table is ≤ n_buckets rows
    joined_offs = F.broadcast(offs) if broadcast_offsets else offs
    ranked = df.join(joined_offs, [*grp, bucket_col]).withColumn(
        out, F.row_number().over(wb) + F.col("_gr_off")
    )
    return ranked.drop("_gr_off")


def with_global_cumsum(
    df: DataFrame,
    order_by: list[Column],
    sums: dict[str, str],
    *,
    bucket_col: str = "bkt",
    pre_shuffle: bool = False,
) -> DataFrame:
    """Exact global running sums over ``order_by`` (``sums`` maps input
    column -> output column), given an order-ascending bucket column:
    per-bucket cumulative windows + the tiny bucket-total table's
    prefix offsets broadcast back.  Integer/exact inputs stay
    bit-identical to the literal global cumulative window; float
    inputs are bit-identical too because addition order within the
    global sequence is preserved (prefix offset first, then in-order
    partial sums) only when the caller's values are bucket-prefix
    associative — for floats, keep inputs rounded/integral if the
    oracle compares exactly.

    ``pre_shuffle=True``: same fused single-exchange form as
    ``with_global_rank`` (the totals aggregate and the cumulative
    window share one explicit bucket repartition via ReusedExchange);
    callers drop the input checkpoint they held for the device.
    """
    if pre_shuffle:
        df = df.repartition(bucket_col)
    totals = df.groupBy(bucket_col).agg(
        *[F.sum(c).alias(f"_gc_{c}") for c in sums]
    )
    # tiny (≤ n_buckets-row) table: the global window is fine HERE
    woff = Window.orderBy(bucket_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = totals.select(
        bucket_col,
        *[
            F.coalesce(F.sum(f"_gc_{c}").over(woff), F.lit(0)).alias(
                f"_gco_{c}"
            )
            for c in sums
        ],
    )
    wb = (
        Window.partitionBy(bucket_col)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    res = df.join(F.broadcast(offs), bucket_col)
    for c, out in sums.items():
        res = res.withColumn(out, F.sum(c).over(wb) + F.col(f"_gco_{c}"))
    return res.drop(*[f"_gco_{c}" for c in sums])


def topk_ranked(
    df: DataFrame,
    keys: list[tuple[str, str]],
    k: int,
    *,
    out: str = "rnk",
) -> DataFrame:
    """Global top-k WITH exact ranks, window-free: ``orderBy().limit(k)``
    plans as a distributed TakeOrderedAndProject (per-partition heaps,
    never a global sort), then the rank column is rebuilt on the ≤k
    survivors by a broadcast k×k self-join count.  ``keys`` is the
    total order as (column, "asc"|"desc") pairs — it must be a TOTAL
    order (include a unique tiebreak) or ranks would be ambiguous.

    Ties (rows identical on every key — a violation of the total-order
    contract) degrade safely to ``rank()`` semantics: all k rows are
    kept (a per-row id keys the re-aggregation, so duplicates never
    collapse) and tied rows share a rank.  That tie degradation is only
    guaranteed CONSISTENT while lineage cuts are active (the production
    default): with cuts disabled (``lineage_cuts_disabled()`` /
    ``SPARK_GRAFT_NO_LINEAGE_CUTS=1``) the ``orderBy().limit(k)`` is
    recomputed independently for the top side and the broadcast other
    side, and ties AT the k boundary may pick different survivors per
    recomputation — audit mode builds and explains plans; it must not
    trust EXECUTED topk_ranked results unless ``keys`` is the total
    order the contract already demands (ADVICE r10, low #4).  The
    match count uses a
    never-null join marker, not a key column, so a null key in a
    matched row cannot undercount; the lexicographic comparison is
    null-aware, placing null keys exactly where Spark's sort does
    (ASC = NULLS FIRST, DESC = NULLS LAST).
    """
    sort_cols = [
        F.col(c).desc() if d == "desc" else F.col(c).asc() for c, d in keys
    ]
    top = (
        df.orderBy(*sort_cols)
        .limit(k)
        .transform(ckpt)
        # limit(k) yields one partition, so the id is a plain 0..k-1
        # row sequence; it only disambiguates duplicate rows and is
        # dropped before returning.
        .withColumn("_tk_rid", F.monotonically_increasing_id())
    )
    other = top.select(
        *[F.col(c).alias(f"_tk_{c}") for c, _ in keys],
        F.lit(1).alias("_tk_hit"),
    )
    # "strictly before" under the lexicographic (keys) order, null-
    # aware to mirror Spark's sort placement (ASC = NULLS FIRST,
    # DESC = NULLS LAST); three-valued-logic nulls in the raw
    # comparison resolve to the correct branch via the isNull guards
    before = F.lit(False)
    eq = F.lit(True)
    for c, d in keys:
        o, s = F.col(f"_tk_{c}"), F.col(c)
        if d == "desc":
            lt = (s.isNull() & o.isNotNull()) | (o > s)
        else:
            lt = (o.isNull() & s.isNotNull()) | (o < s)
        before = before | (eq & lt)
        eq = eq & o.eqNullSafe(s)
    group_cols = [c for c in top.columns]
    return (
        top.join(F.broadcast(other), before, "left")
        .groupBy(*group_cols)
        .agg((F.count("_tk_hit") + 1).cast("int").alias(out))
        .drop("_tk_rid")
    )


def with_hot_cell_subsplit(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    *,
    group_by: tuple[str, ...] = (),
    bucket_col: str = "bkt",
    out: str = "bkt2",
    n_subbuckets: int = 16,
    tiebreak_descending: bool = False,
    broadcast_stats: bool | None = None,
) -> DataFrame:
    """Second-level split for HOT (group, bucket) cells with a
    CONSTANT sort key (round 11, VERDICT r10 #6): when a single
    group's values all collapse into one bucket because they are
    IDENTICAL (one mega-domain with a constant hash prefix, a
    corpus where 90% of scores are exactly 0.0), the per-(grp, bkt)
    window is that whole group in one task — a straggler the primary
    range bucket cannot split, since equal keys MUST share a bucket
    for rank exactness.

    The way out is that inside a constant-value cell the sort order
    is decided entirely by the TIEBREAK, so sub-bucketing by a
    monotone range function of the tiebreak preserves exactness
    there — and everywhere else the sub-bucket is a constant, a pure
    refinement no-op.  ``out`` is a composite bucket, monotone within
    each group in the (value, tiebreak) sort order:

    * different primary buckets → composite preserves their order;
    * same cell, constant value (``min(value) <=> max(value)`` per
      cell — all-null cells from ``with_range_bucket``'s null bucket
      included) → sub-bucket is range-monotone in the tiebreak, with
      null tiebreaks in their own slot exactly where the window sort
      puts them (ASC = NULLS FIRST slot 0, DESC = NULLS LAST slot
      n_subbuckets+1);
    * same cell, varying value → one shared sub-bucket (rows stay
      together; the within-cell window orders them exactly as
      before).

    Feed ``out`` to ``with_global_rank(..., bucket_col=out)`` with an
    ``order_by`` whose first two columns are (value, tiebreak) in the
    matching directions — the result stays bit-identical to the
    literal global window (pinned in tests/test_ranks.py against a
    pathological single-bucket constant-key group).

    The per-cell stats table is ≤ |groups|·(n_buckets+1) rows — same
    size class as the rank device's offset table, so the same join
    policy (round-11 rule): broadcast only when ``group_by`` is empty,
    shuffled equi-join otherwise, ``broadcast_stats`` to override.

    Precondition: ``bucket_col`` came from ``with_range_bucket`` over
    ``value_col`` (equal values share a bucket; null values sit alone
    in the dedicated null bucket), so a cell never mixes null and
    non-null values.
    """
    grp = list(group_by)
    stats = df.groupBy(*grp, bucket_col).agg(
        F.min(value_col).alias("_sc_vmn"),
        F.max(value_col).alias("_sc_vmx"),
        F.min(tiebreak_col).alias("_sc_tmn"),
        F.max(tiebreak_col).alias("_sc_tmx"),
    )
    if broadcast_stats is None:
        broadcast_stats = not grp
    joined = df.join(
        F.broadcast(stats) if broadcast_stats else stats,
        [*grp, bucket_col],
    )
    k = n_subbuckets
    t = F.col(tiebreak_col).cast("double")
    tmn = F.col("_sc_tmn").cast("double")
    tmx = F.col("_sc_tmx").cast("double")
    # span is direction-independent (tmx >= tmn always); direction
    # lives in pos.  (A round-11 draft negated span for descending,
    # which made `span > 0` always false — descending cells silently
    # fell back to the no-split sub-bucket: still bit-identical, but
    # the straggler split never happened.  tests/test_ranks.py now
    # asserts the split actually occurs in both directions.)
    span = tmx - tmn
    pos = (tmx - t) if tiebreak_descending else (t - tmn)
    sub_real = (
        F.when(
            span > 0,
            F.least(F.floor(pos * float(k) / span), F.lit(k - 1)),
        ).otherwise(F.lit(0))
        + 1
    )
    null_slot = F.lit(k + 1) if tiebreak_descending else F.lit(0)
    constant_v = F.col("_sc_vmn").eqNullSafe(F.col("_sc_vmx"))
    sub = F.when(~constant_v, F.lit(0)).otherwise(
        F.when(t.isNull(), null_slot).otherwise(sub_real)
    )
    width = k + 2
    composite = (F.col(bucket_col).cast("bigint") * width + sub).cast("int")
    return joined.withColumn(out, composite).drop(
        "_sc_vmn", "_sc_vmx", "_sc_tmn", "_sc_tmx"
    )
