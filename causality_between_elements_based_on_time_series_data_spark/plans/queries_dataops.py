"""Data-engineering operational patterns (SURVEY.md §2 engine
extensions): declarative data-quality expectations (the Deequ-style
constraint audit), snapshot diffing (CDC accounting between two table
versions), and incremental aggregate maintenance (algebraic
materialized-view refresh).

These are the jobs that run AROUND an analytics engine in production:
every one is a single-pass or key-partitioned plan, fully DuckDB-
oracled, and none moves the fact table more than once.  The reference
has no operational layer at all (its pipeline is a single in-memory
script, run.py:39-73) — this module is part of the 100 TB [EXT]
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lineage import ckpt

from ..sources.catalog import load_table
from .registry import register


@register(
    "data_quality_expectations",
    oracle="""
    SELECT 'orders.o_orderkey unique' AS expectation,
           CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
                AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'orders.o_custkey referential',
           CAST((SELECT count(*) FROM orders
                 WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_quantity in (0, 60]',
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_quantity <= 0 OR l_quantity > 60) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_discount in [0, 0.3]',
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 0.3) AS BIGINT)
    UNION ALL
    SELECT 'customer.c_name not null',
           CAST((SELECT count(*) FROM customer WHERE c_name IS NULL)
                AS BIGINT)
    ORDER BY expectation
    """,
    doc="Declarative data-quality expectations (the Deequ/dbt-test "
    "audit pattern): uniqueness, referential integrity, accepted "
    "ranges, and non-null checks evaluated as ONE violation-count "
    "row per constraint.  Each check is a single aggregate or "
    "anti-join over its table — the FK check broadcasts the key set "
    "when small and anti-joins keyed otherwise; nothing scans a "
    "fact table twice for two constraints on the same table "
    "(range + null checks share a pass via conditional sums).  At "
    "100 TB this audit gates every pipeline stage; all-zero "
    "violations on the fixture is itself the assertion that the "
    "generator upholds its contract.",
    tags=("dataops", "quality", "agg"),
)
def data_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    uniq = orders.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).cast("bigint").alias("n")
    ).select(F.lit("orders.o_orderkey unique").alias("expectation"), F.col("n").alias("n_violations"))

    fk = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == customer.c_custkey,
            "left_anti",
        )
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            F.lit("orders.o_custkey referential").alias("expectation"),
            F.col("n").alias("n_violations"),
        )
    )

    # one shared lineitem pass for both range constraints
    li_checks = li.agg(
        F.sum(((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 60)).cast("int"))
        .cast("bigint")
        .alias("qty_bad"),
        F.sum(((F.col("l_discount") < 0) | (F.col("l_discount") > 0.3)).cast("int"))
        .cast("bigint")
        .alias("disc_bad"),
    )
    qty = li_checks.select(
        F.lit("lineitem.l_quantity in (0, 60]").alias("expectation"),
        F.col("qty_bad").alias("n_violations"),
    )
    disc = li_checks.select(
        F.lit("lineitem.l_discount in [0, 0.3]").alias("expectation"),
        F.col("disc_bad").alias("n_violations"),
    )

    nn = customer.agg(
        F.sum(F.col("c_name").isNull().cast("int")).cast("bigint").alias("n")
    ).select(
        F.lit("customer.c_name not null").alias("expectation"),
        F.col("n").alias("n_violations"),
    )

    return (
        uniq.unionByName(fk)
        .unionByName(qty)
        .unionByName(disc)
        .unionByName(nn)
        .orderBy("expectation")
    )


_SNAPSHOT_ORACLE_BASE = """
    WITH v1 AS (
        SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        FROM customer WHERE c_custkey % 97 <> 0
    ),
    v2 AS (
        SELECT c_custkey,
               round(CASE WHEN c_mktsegment = 'BUILDING'
                          THEN c_acctbal * 1.1 ELSE c_acctbal END, 2) AS acctbal
        FROM customer WHERE c_custkey % 89 <> 0
    )
"""


@register(
    "snapshot_diff_counts",
    oracle=_SNAPSHOT_ORACLE_BASE
    + """
    SELECT CAST(sum(CASE WHEN v1.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_inserted,
           CAST(sum(CASE WHEN v2.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_deleted,
           CAST(sum(CASE WHEN v1.c_custkey IS NOT NULL AND v2.c_custkey IS NOT NULL
                          AND v1.acctbal <> v2.acctbal THEN 1 ELSE 0 END) AS BIGINT)
               AS n_updated,
           CAST(sum(CASE WHEN v1.c_custkey IS NOT NULL AND v2.c_custkey IS NOT NULL
                          AND v1.acctbal = v2.acctbal THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unchanged
    FROM v1 FULL OUTER JOIN v2 ON v1.c_custkey = v2.c_custkey
    """,
    doc="Snapshot diff / change-data accounting: two table versions "
    "(synthesized deterministically from customer — %97 rows absent "
    "from v1, %89 absent from v2, BUILDING balances revalued) "
    "full-outer-joined on the key and classified into inserted / "
    "deleted / updated / unchanged counts — the audit a CDC consumer "
    "runs to reconcile a feed against a rebuild.  One keyed shuffle "
    "per side; the classification is row-local on the joined "
    "result.",
    tags=("dataops", "join"),
)
def snapshot_diff_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    v1 = c.filter(F.col("c_custkey") % 97 != 0).select(
        "c_custkey", F.round("c_acctbal", 2).alias("acctbal")
    )
    v2 = c.filter(F.col("c_custkey") % 89 != 0).select(
        "c_custkey",
        F.round(
            F.when(
                F.col("c_mktsegment") == "BUILDING", F.col("c_acctbal") * 1.1
            ).otherwise(F.col("c_acctbal")),
            2,
        ).alias("acctbal"),
    )
    j = v1.alias("v1").join(
        v2.alias("v2"), F.col("v1.c_custkey") == F.col("v2.c_custkey"), "full_outer"
    )
    return j.agg(
        F.sum(F.col("v1.c_custkey").isNull().cast("int")).cast("bigint").alias("n_inserted"),
        F.sum(F.col("v2.c_custkey").isNull().cast("int")).cast("bigint").alias("n_deleted"),
        F.sum(
            (
                F.col("v1.c_custkey").isNotNull()
                & F.col("v2.c_custkey").isNotNull()
                & (F.col("v1.acctbal") != F.col("v2.acctbal"))
            ).cast("int")
        )
        .cast("bigint")
        .alias("n_updated"),
        F.sum(
            (
                F.col("v1.c_custkey").isNotNull()
                & F.col("v2.c_custkey").isNotNull()
                & (F.col("v1.acctbal") == F.col("v2.acctbal"))
            ).cast("int")
        )
        .cast("bigint")
        .alias("n_unchanged"),
    )


@register(
    "incremental_agg_maintenance",
    oracle="""
    SELECT c_mktsegment,
           round(sum(o_totalprice), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders JOIN customer ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="Incremental aggregate maintenance (algebraic materialized-"
    "view refresh): the base aggregate is computed over the 'old' "
    "orders (o_orderkey %% 10 <> 0), the late-arriving delta batch "
    "(%% 10 == 0) is aggregated SEPARATELY, and the two partial-"
    "aggregate tables merge by key summation — sum and count are "
    "algebraic, so refresh cost is O(delta + |view|), never a "
    "re-scan of the base facts.  The oracle is the full recompute "
    "over ALL orders: merged-incremental == recomputed is exactly "
    "the invariant a production MV refresh must uphold.",
    tags=("dataops", "agg"),
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    def seg_agg(o: DataFrame) -> DataFrame:
        return (
            o.join(customer, o.o_custkey == customer.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.sum("o_totalprice").alias("rev_part"),
                F.count("*").alias("n_part"),
            )
        )

    base = seg_agg(orders.filter(F.col("o_orderkey") % 10 != 0))
    delta = seg_agg(orders.filter(F.col("o_orderkey") % 10 == 0))
    return (
        base.unionByName(delta)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("rev_part"), 2).alias("revenue"),
            F.sum("n_part").cast("bigint").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "kfold_assignment_balance",
    oracle="""
    WITH folds AS (
        SELECT vec_id, label,
               CAST((vec_id * 2654435761) % 2147483647 % 5 AS INTEGER) AS fold
        FROM embeddings
    )
    SELECT fold,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT label) AS BIGINT) AS n_classes,
           round(avg(CAST(label AS DOUBLE)), 6) AS mean_label
    FROM folds
    GROUP BY fold
    ORDER BY fold
    """,
    doc="Deterministic k-fold cross-validation assignment (ML-ops "
    "prep): fold = Knuth-multiplicative hash of the row key mod k — "
    "portable integer arithmetic (mod 2^31-1 keeps ANSI mode happy), "
    "so the SAME split reproduces on any engine, any partitioning, "
    "any day, with no stored split table.  The query audits the "
    "split: per-fold row counts, class coverage, and mean label "
    "over the 10-class fixture labels — the balance check run "
    "before trusting any CV estimate.  Map-side hash + one tiny "
    "k-row aggregate; at 100 TB the assignment is a free column, "
    "never a shuffle.",
    tags=("dataops", "ml"),
)
def kfold_assignment_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    fold = ((F.col("vec_id") * 2654435761) % 2147483647 % 5).cast("int")
    return (
        emb.select(fold.alias("fold"), "label")
        .groupBy("fold")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct("label").cast("bigint").alias("n_classes"),
            F.round(F.avg(F.col("label").cast("double")), 6).alias("mean_label"),
        )
        .orderBy("fold")
    )


@register(
    "roc_curve_points",
    oracle="""
    WITH scored AS (
        SELECT CASE WHEN label >= 5 THEN 1 ELSE 0 END AS label,
               round(1.0 / (1.0 + exp(-list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE))) )), 6) AS score
        FROM embeddings
    ),
    totals AS (
        SELECT CAST(sum(label) AS DOUBLE) AS p,
               CAST(sum(1 - label) AS DOUBLE) AS n
        FROM scored
    ),
    thresholds AS (
        SELECT CAST(t AS DOUBLE) / 10 AS thr FROM range(0, 11) r(t)
    )
    SELECT thr,
           round(sum(CASE WHEN score >= thr THEN label ELSE 0 END) / max(p), 6)
               AS tpr,
           round(sum(CASE WHEN score >= thr THEN 1 - label ELSE 0 END) / max(n), 6)
               AS fpr,
           CAST(sum(CASE WHEN score >= thr THEN 1 ELSE 0 END) AS BIGINT)
               AS n_predicted_pos
    FROM thresholds CROSS JOIN scored CROSS JOIN totals
    GROUP BY thr
    ORDER BY thr
    """,
    doc="ROC curve points (classifier-eval breadth beside the exact "
    "auc_mann_whitney): the 10-class fixture label binarized at "
    ">= 5, scored by a deterministic sigmoid over each embedding's "
    "coordinate sum, evaluated at 11 fixed thresholds — "
    "TPR/FPR/predicted-positive per point.  The threshold grid "
    "broadcasts (11 rows) against the scored corpus and every "
    "(threshold, row) contribution is a conditional sum, so one "
    "pass over the data yields the whole curve — the 100 TB form; "
    "score rounds to 6dp on both engines before thresholding so "
    "boundary rows classify identically.",
    tags=("dataops", "ml", "stats"),
)
def roc_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    coord_sum = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    scored = emb.select(
        (F.col("label") >= 5).cast("int").alias("label"),
        F.round(1.0 / (1.0 + F.exp(-coord_sum)), 6).alias("score"),
    )
    thresholds = spark.range(0, 11).select(
        (F.col("id").cast("double") / 10).alias("thr")
    )
    totals = scored.agg(
        F.sum("label").cast("double").alias("p"),
        F.sum(1 - F.col("label")).cast("double").alias("n"),
    )
    return (
        F.broadcast(thresholds)
        .crossJoin(scored)
        .crossJoin(F.broadcast(totals))
        .groupBy("thr")
        .agg(
            F.round(
                F.sum(F.when(F.col("score") >= F.col("thr"), F.col("label")).otherwise(0))
                / F.max("p"),
                6,
            ).alias("tpr"),
            F.round(
                F.sum(
                    F.when(F.col("score") >= F.col("thr"), 1 - F.col("label")).otherwise(0)
                )
                / F.max("n"),
                6,
            ).alias("fpr"),
            F.sum(F.when(F.col("score") >= F.col("thr"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_predicted_pos"),
        )
        .orderBy("thr")
    )


@register(
    "key_skew_diagnostics",
    oracle="""
    WITH kc AS (
        SELECT l_partkey AS k, CAST(count(*) AS DOUBLE) AS c
        FROM lineitem GROUP BY 1
    ),
    ranked AS (
        SELECT c,
               row_number() OVER (ORDER BY c, k) AS i,
               count(*) OVER () AS n,
               sum(c) OVER () AS tot
        FROM kc
    ),
    topn AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, k) AS r FROM kc
    )
    SELECT CAST(max(n) AS BIGINT) AS n_keys,
           round(max(tot) / max(n), 4) AS mean_rows_per_key,
           round((SELECT max(c) FROM kc) / max(tot), 6) AS top1_share,
           round((SELECT sum(c) FROM topn WHERE r <= 10) / max(tot), 6)
               AS top10_share,
           round(2.0 * sum(i * c) / (max(n) * max(tot))
                 - (max(n) + 1.0) / max(n), 6) AS gini
    FROM ranked
    """,
    doc="Join/shuffle skew diagnostics for a key column — the "
    "pre-flight check before picking a partitioning strategy (salting "
    "threshold, AQE skew-join expectations): per-key counts reduced "
    "map-side, then heavy-hitter shares (top-1/top-10) and the Gini "
    "coefficient of the key distribution from the rank formula "
    "G = 2·Σi·cᵢ/(n·Σc) − (n+1)/n.  NO rank window over the |keys| "
    "table (millions of rows at 100 TB — the WindowExec trap): tie "
    "order within equal counts cannot change Σi·cᵢ, so the rank sum "
    "collapses to the COUNT HISTOGRAM identity "
    "Σ_c c·(m_c·off_c + m_c(m_c+1)/2) over distinct count values "
    "(off_c = keys with smaller count, via the bucket+offset cumsum "
    "device of operators/ranks.py), and the top-10 share needs only "
    "a distributed TakeOrderedAndProject + sum, never ranks.",
    tags=("dataops", "agg", "skew"),
)
def key_skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranks import with_global_cumsum, with_range_bucket

    li = load_table(spark, sf_dir, "lineitem")
    kc = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count("*").cast("double").alias("c")
    ).transform(ckpt)
    # count histogram: one row per distinct count value — the rank-sum
    # identity makes per-key ranks unnecessary
    hist = kc.groupBy("c").agg(F.count("*").cast("double").alias("m"))
    cum = with_global_cumsum(
        with_range_bucket(hist, "c"), [F.col("c")], {"m": "cum_m"},
        pre_shuffle=True,
    )
    m, c = F.col("m"), F.col("c")
    off = F.col("cum_m") - m
    acc = cum.select(
        (c * (m * off + m * (m + 1) / 2)).alias("term")
    ).agg(F.sum("term").alias("sic"))
    stats = kc.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("c").alias("tot"),
        F.max("c").alias("cmax"),
    )
    top10 = (
        kc.orderBy(F.desc("c"), F.asc("k"))
        .limit(10)
        .agg(F.sum("c").alias("top10"))
    )
    return (
        acc.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(top10))
        .select(
            F.col("n").cast("bigint").alias("n_keys"),
            F.round(F.col("tot") / F.col("n"), 4).alias("mean_rows_per_key"),
            F.round(F.col("cmax") / F.col("tot"), 6).alias("top1_share"),
            F.round(F.col("top10") / F.col("tot"), 6).alias("top10_share"),
            F.round(
                2.0 * F.col("sic") / (F.col("n") * F.col("tot"))
                - (F.col("n") + 1.0) / F.col("n"),
                6,
            ).alias("gini"),
        )
    )


@register(
    "psi_value_drift",
    oracle="""
    WITH bounds AS (
        SELECT min(value) AS mn, max(value) AS mx FROM events
    ),
    binned AS (
        SELECT least(9, CAST(floor((e.value - b.mn) / ((b.mx - b.mn) / 10))
                             AS INTEGER)) AS bin,
               CAST(e.ts < TIMESTAMP '2024-01-16 00:00:00' AS INTEGER) AS p1
        FROM events e CROSS JOIN bounds b
    ),
    grid AS (SELECT unnest(range(0, 10)) AS bin),
    counts AS (
        SELECT g.bin,
               CAST(coalesce(sum(b.p1), 0) AS DOUBLE) AS c1,
               CAST(coalesce(sum(1 - b.p1), 0) AS DOUBLE) AS c2
        FROM grid g LEFT JOIN binned b ON b.bin = g.bin
        GROUP BY g.bin
    ),
    tot AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM counts)
    SELECT round(sum(((c.c2 + 1) / (t.n2 + 10) - (c.c1 + 1) / (t.n1 + 10))
                     * ln(((c.c2 + 1) / (t.n2 + 10))
                          / ((c.c1 + 1) / (t.n1 + 10)))), 6) AS psi,
           CAST(max(t.n1) AS BIGINT) AS n_period1,
           CAST(max(t.n2) AS BIGINT) AS n_period2
    FROM counts c CROSS JOIN tot t
    """,
    doc="Population stability index (PSI) of the event-value "
    "distribution between the first and second half of the window — "
    "the standard model-monitoring drift metric (PSI > 0.2 = "
    "significant shift).  Ten fixed-width bins from the global "
    "min/max (one 2-number aggregate, broadcast back), add-one "
    "smoothing so empty bins stay finite, and the full 0..9 bin grid "
    "is generated so both periods account for unoccupied bins "
    "identically.  One pass over the facts; everything after the "
    "bin-count aggregate is 10-row arithmetic.  Complements "
    "source_kl_divergence (cross-source shift) with temporal shift.",
    tags=("dataops", "agg", "drift"),
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(9),
            F.floor((F.col("value") - F.col("mn")) / ((F.col("mx") - F.col("mn")) / 10)).cast(
                "int"
            ),
        ).alias("bin"),
        (F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"))
        .cast("int")
        .alias("p1"),
    )
    grid = ev.sparkSession.range(0, 10).select(F.col("id").cast("int").alias("bin"))
    counts = (
        grid.join(binned, "bin", "left")
        .groupBy("bin")
        .agg(
            F.coalesce(F.sum("p1"), F.lit(0)).cast("double").alias("c1"),
            F.coalesce(F.sum(1 - F.col("p1")), F.lit(0)).cast("double").alias("c2"),
        )
        # 10 rows consumed twice (totals + PSI): don't rescan events
        .transform(ckpt)
    )
    tot = counts.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    q1 = (F.col("c1") + 1) / (F.col("n1") + 10)
    q2 = (F.col("c2") + 1) / (F.col("n2") + 10)
    return counts.crossJoin(F.broadcast(tot)).agg(
        F.round(F.sum((q2 - q1) * F.log(q2 / q1)), 6).alias("psi"),
        F.max("n1").cast("bigint").alias("n_period1"),
        F.max("n2").cast("bigint").alias("n_period2"),
    )


@register(
    "benford_first_digit_audit",
    oracle="""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INTEGER) AS d
        FROM orders
        WHERE o_totalprice >= 1
    ),
    obs AS (
        SELECT d, CAST(count(*) AS DOUBLE) AS o FROM digits GROUP BY d
    ),
    tot AS (SELECT sum(o) AS n FROM obs)
    SELECT CAST(obs.d AS INTEGER) AS digit,
           CAST(obs.o AS BIGINT) AS observed,
           round(tot.n * log10(1.0 + 1.0 / obs.d), 2) AS benford_expected,
           round(pow(obs.o - tot.n * log10(1.0 + 1.0 / obs.d), 2)
                 / (tot.n * log10(1.0 + 1.0 / obs.d)), 6) AS chi2_term
    FROM obs CROSS JOIN tot
    ORDER BY digit
    """,
    doc="Benford's-law first-digit audit of order totals — the "
    "fabricated-data / ingestion-corruption screen: observed "
    "first-digit counts vs the log10(1 + 1/d) expectation, with the "
    "per-digit chi-square contribution (sum them and compare to the "
    "8-dof critical value).  First digits come from integer-truncated "
    "string heads, identical arithmetic both engines; one pass over "
    "the facts, then 9-row arithmetic.  (TPC-H uniform prices flunk "
    "Benford, which is exactly what the audit should report for "
    "synthetic data.)",
    tags=("dataops", "agg", "audit"),
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    digits = o.filter(F.col("o_totalprice") >= 1).select(
        F.substring(F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1)
        .cast("int")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count("*").cast("double").alias("o"))
    tot = obs.agg(F.sum("o").alias("n"))
    expected = F.col("n") * F.log10(1.0 + 1.0 / F.col("d"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").cast("int").alias("digit"),
            F.col("o").cast("bigint").alias("observed"),
            F.round(expected, 2).alias("benford_expected"),
            F.round(F.pow(F.col("o") - expected, 2) / expected, 6).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# --- Bloom-filter semi-join pruning -----------------------------------

_BLOOM_M = 8192
_BLOOM_P = 999983
_BLOOM_HASHES = ((40503, 1), (65599, 17), (131071, 29))


@register(
    "bloom_semijoin_prune",
    oracle=f"""
    WITH keys AS (
        SELECT DISTINCT c_custkey AS k FROM customer
        WHERE c_mktsegment = 'BUILDING'
    ),
    bloom AS (
        SELECT list_sort(list(DISTINCT pos)) AS bl FROM (
            SELECT unnest(ARRAY[
                {", ".join(f"((k * {a} + {b}) % {_BLOOM_P}) % {_BLOOM_M}" for a, b in _BLOOM_HASHES)}
            ]) AS pos FROM keys
        )
    ),
    probe AS (
        SELECT o.o_orderpriority,
               ({" AND ".join(f"list_contains((SELECT bl FROM bloom), ((o.o_custkey * {a} + {b}) % {_BLOOM_P}) % {_BLOOM_M})" for a, b in _BLOOM_HASHES)})
                   AS bloom_pass,
               (k.k IS NOT NULL) AS is_member
        FROM orders o LEFT JOIN keys k ON k.k = o.o_custkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (WHERE bloom_pass) AS BIGINT) AS n_bloom_pass,
           CAST(count(*) FILTER (WHERE is_member) AS BIGINT) AS n_true_match,
           CAST(count(*) FILTER (WHERE bloom_pass AND NOT is_member) AS BIGINT)
               AS n_false_positive
    FROM probe
    GROUP BY 1 ORDER BY 1
    """,
    doc="Bloom-filter semi-join pruning audit: the BUILDING-segment "
    "customer keys are folded into an m=8192-bit, k=3 Bloom filter "
    "(Knuth-multiplicative hashes, ANSI-safe moduli), the filter is "
    "broadcast, and the orders fact is probed MAP-SIDE — the pattern "
    "that replaces a shuffled semi-join when the build side is too "
    "big to broadcast raw but its bitset is not (at 100 TB: millions "
    "of keys -> a few KB..MB of bits vs GBs of keys).  Output "
    "reconciles the filter against the exact semi-join truth per "
    "order priority: no-false-negative is the structural guarantee "
    "(n_bloom_pass >= n_true_match), and n_false_positive measures "
    "the wasted post-filter work the downstream exact join still "
    "eliminates.  Deterministic integer hashing keeps the filter "
    "bit-identical in the DuckDB oracle.",
    tags=("dataops", "join", "sketch"),
)
def bloom_semijoin_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    keys = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
        .transform(ckpt)
    )
    positions = keys.select(
        F.explode(
            F.array(
                *[
                    ((F.col("k") * a + b) % _BLOOM_P % _BLOOM_M)
                    for a, b in _BLOOM_HASHES
                ]
            )
        ).alias("pos")
    )
    bloom = positions.agg(F.array_sort(F.collect_set("pos")).alias("bl"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_custkey"
    )
    bloom_pass = None
    for a, b in _BLOOM_HASHES:
        term = F.array_contains(
            F.col("bl"), (F.col("o_custkey") * a + b) % _BLOOM_P % _BLOOM_M
        )
        bloom_pass = term if bloom_pass is None else (bloom_pass & term)
    probe = (
        orders.crossJoin(F.broadcast(bloom))
        .join(
            F.broadcast(keys),
            F.col("k") == F.col("o_custkey"),
            "left",
        )
        .select(
            "o_orderpriority",
            bloom_pass.alias("bloom_pass"),
            F.col("k").isNotNull().alias("is_member"),
        )
    )
    return (
        probe.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("bloom_pass").cast("int")).cast("bigint").alias(
                "n_bloom_pass"
            ),
            F.sum(F.col("is_member").cast("int")).cast("bigint").alias(
                "n_true_match"
            ),
            F.sum((F.col("bloom_pass") & ~F.col("is_member")).cast("int"))
            .cast("bigint")
            .alias("n_false_positive"),
        )
        .orderBy("o_orderpriority")
    )


# --- Order-independent table content fingerprints ---------------------

_FP_P = 999983


@register(
    "table_fingerprint_audit",
    oracle=f"""
    WITH r AS (
        SELECT 'region' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST('0x' || substr(md5(
                   concat_ws('|', CAST(r_regionkey AS VARCHAR), r_name)
               ), 1, 12) AS BIGINT) % {_FP_P}) % {_FP_P} AS BIGINT) AS fingerprint
        FROM region
    ),
    n AS (
        SELECT 'nation', CAST(count(*) AS BIGINT),
               CAST(sum(CAST('0x' || substr(md5(
                   concat_ws('|', CAST(n_nationkey AS VARCHAR), n_name,
                             CAST(n_regionkey AS VARCHAR))
               ), 1, 12) AS BIGINT) % {_FP_P}) % {_FP_P} AS BIGINT)
        FROM nation
    ),
    s AS (
        SELECT 'supplier', CAST(count(*) AS BIGINT),
               CAST(sum(CAST('0x' || substr(md5(
                   concat_ws('|', CAST(s_suppkey AS VARCHAR), s_name,
                             CAST(s_nationkey AS VARCHAR))
               ), 1, 12) AS BIGINT) % {_FP_P}) % {_FP_P} AS BIGINT)
        FROM supplier
    )
    SELECT * FROM r UNION ALL SELECT * FROM n UNION ALL SELECT * FROM s
    ORDER BY table_name
    """,
    doc="Order-independent table content fingerprints (replication / "
    "migration audit): each row folds to an md5-derived 48-bit code "
    "over a canonical '|'-joined projection, codes sum mod a prime — "
    "commutative, so the fingerprint is independent of row order, "
    "partitioning, and engine, and two replicas compare by exchanging "
    "one (table, n_rows, fingerprint) row each.  One map-side pass "
    "per table, no shuffle beyond the 1-row aggregate.  (At extreme "
    "row counts the partial sums are modded before combining — the "
    "aggregate stays ANSI-safe.)  String/int columns only: float "
    "formatting is engine-specific and has no canonical text form.",
    tags=("dataops", "audit"),
)
def table_fingerprint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def fp(df: DataFrame, name: str, cols: list) -> DataFrame:
        canon = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
        code = (
            F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("bigint") % _FP_P
        )
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count("*").cast("bigint").alias("n_rows"),
            (F.sum(code) % _FP_P).cast("bigint").alias("fingerprint"),
        )

    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        fp(region, "region", ["r_regionkey", "r_name"])
        .unionAll(
            fp(nation, "nation", ["n_nationkey", "n_name", "n_regionkey"])
        )
        .unionAll(fp(supplier, "supplier", ["s_suppkey", "s_name", "s_nationkey"]))
        .orderBy("table_name")
    )
