"""Bucketed co-located join (SURVEY.md §4.2 / pyspark guide
"Partitioning & shuffle"): writing both join sides bucketed on the
join key lets Spark plan a SortMergeJoin with NO Exchange on either
side — the 100 TB pattern for repeated large-large joins.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
    load_table,
    reset_bucket_table,
    session_bucket_table,
)


def _formatted_plan(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    # default warehouse dir (spark.sql.warehouse.dir is static);
    # spark-warehouse/ + metastore artifacts are gitignored
    spark.sql("CREATE DATABASE IF NOT EXISTS buckets")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("buckets.li_b")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("buckets.orders_b")
    )
    # broadcast would bypass the point — force SMJ to prove co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("buckets.li_b").join(
            spark.table("buckets.orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "SortMergeJoin" in plan
        assert not re.search(r"\(\d+\)\s+Exchange", plan), plan
        # and it still computes the right thing
        n = joined.count()
        assert n == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS buckets.li_b")
        spark.sql("DROP TABLE IF EXISTS buckets.orders_b")


def test_ivf_bucketed_matches_plain_ivf(spark, sf_dir):
    """ivf_bucketed_cosine_topk materializes the corpus bucketed by
    cluster but must answer identically to the in-memory ivf path
    (same KMeans seed -> same model -> same candidates -> same re-rank)."""
    from causality_between_elements_based_on_time_series_data_spark.operators.ivf import (
        ivf_bucketed_cosine_topk,
        ivf_cosine_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    table = session_bucket_table(spark, "t_ivf_corpus")
    reset_bucket_table(spark, table)
    try:
        plain = ivf_cosine_topk(emb, queries, k=3, n_clusters=8, n_probe=2)
        bucketed = ivf_bucketed_cosine_topk(
            spark, emb, queries, table, k=3, n_clusters=8, n_probe=2
        )
        a = sorted(map(tuple, plain.select("qid", "nid", "rn").collect()))
        b = sorted(map(tuple, bucketed.select("qid", "nid", "rn").collect()))
        assert a == b and len(a) > 0
    finally:
        reset_bucket_table(spark, table)


def test_ivf_bucketed_corpus_plan_shapes(spark, sf_dir):
    """The two physical claims of the bucketed-IVF layout, gated:

    1. a literal cluster probe PRUNES buckets at the scan (only the
       probed inverted lists are read -- the 100 TB read-reduction), and
    2. a probe join on cluster is CO-LOCATED: SortMergeJoin with the
       single Exchange on the tiny probe side, none on the corpus side.
    """
    from causality_between_elements_based_on_time_series_data_spark.operators.ivf import (
        ivf_assign,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _centers = ivf_assign(emb, n_clusters=8)
    table = session_bucket_table(spark, "t_ivf_prune")
    reset_bucket_table(spark, table)
    try:
        (
            assigned.write.mode("overwrite")
            .bucketBy(8, "cluster")
            .sortBy("cluster")
            .saveAsTable(table)
        )
        corpus = spark.table(table)

        # bucket pruning needs a bucketed scan; Spark's planner disables
        # bucketed reading when no operator exploits the distribution
        # ("Bucketed: false (disabled by query planner)"), so pin it on
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        try:
            pruned = corpus.filter(F.col("cluster").isin(1, 3))
            plan = _formatted_plan(pruned)
            m = re.search(r"SelectedBucketsCount: (\d+) out of 8", plan)
            # cluster values hash to buckets (murmur3 pmod 8), so assert
            # pruning happened, not a specific bucket count
            assert m and int(m.group(1)) < 8, plan
        finally:
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
            )

        probes = spark.createDataFrame([(1,), (3,)], "cluster int")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = corpus.join(probes, "cluster")
            plan = _formatted_plan(j)
            assert "SortMergeJoin" in plan, plan
            # exactly one Exchange -- aligning the probe side to the
            # corpus's 8 buckets; the corpus side reads in place
            assert len(re.findall(r"\(\d+\)\s+Exchange", plan)) == 1, plan
            assert j.count() > 0
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
    finally:
        reset_bucket_table(spark, table)


def _tree_lines(plan: str) -> list[tuple[int, str]]:
    """(marker_column, node_text) for each physical-tree line of a
    formatted plan — marker column = indent depth, so a node's
    ancestors are the nearest lines above with a smaller marker
    column."""
    out = []
    for line in plan.splitlines():
        m = re.search(r"[+:][-]\s+(\S.*)$", line)
        if m:
            out.append((m.start(), m.group(1)))
        elif re.match(r"^\w.*\(\d+\)$", line.strip()) and not out:
            out.append((-1, line.strip()))  # root node has no marker
    return out


def ancestors_until_each(plan: str, needle: str, stop: str) -> list[list[str]]:
    """For EVERY tree node containing ``needle``: the node texts
    strictly between it and its nearest ancestor containing ``stop``.
    A needle may occur several times (cuts-disabled audit plans
    re-derive shared subtrees per consumer) — each occurrence gets its
    own chain, and each must have a ``stop`` ancestor."""
    lines = _tree_lines(plan)
    idxs = [i for i, (_, t) in enumerate(lines) if needle in t]
    assert idxs, (needle, plan)
    chains: list[list[str]] = []
    for i in idxs:
        col = lines[i][0]
        chain: list[str] = []
        for j in range(i - 1, -1, -1):
            c, t = lines[j]
            if c < col:
                if stop in t:
                    break
                chain.append(t)
                col = c
        else:
            raise AssertionError(f"no {stop!r} ancestor above {needle!r}")
        chains.append(chain)
    return chains


def test_persisted_dedup_index_join_no_index_side_exchange(spark, sf_dir):
    """incremental_dedup_persisted_index: the per-ingest probe must
    never re-shuffle the persisted index — the band-posting join reads
    the bucketed table straight into the SortMergeJoin (Filter /
    Project / local Sort allowed; Exchange is the regression), and the
    index tables actually scan bucketed."""
    from causality_between_elements_based_on_time_series_data_spark.lineage import (
        lineage_cuts_disabled,
    )
    from causality_between_elements_based_on_time_series_data_spark.plans import (
        REGISTRY,
    )

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # cuts disabled so the tier-1 keys-table scan (beneath the
        # `exact` checkpoint) is visible to the bucketed-scan count
        with lineage_cuts_disabled():
            plan = _formatted_plan(
                REGISTRY["incremental_dedup_persisted_index"].fn(
                    spark, sf_dir
                )
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    # every read of the postings table (the cuts-disabled audit plan
    # re-derives cand per consumer) must reach its band join with no
    # index-side re-shuffle
    for chain in ancestors_until_each(plan, "dedup_idx_bands", "SortMergeJoin"):
        assert not any("Exchange" in t for t in chain), chain
    # all three index tables read through the bucketed-scan path
    assert plan.count("Bucketed: true") >= 3, plan


def _detail_blocks(plan: str) -> dict[int, str]:
    """node id -> full detail-section text of a formatted plan."""
    blocks: dict[int, str] = {}
    cur: int | None = None
    for line in plan.splitlines():
        m = re.match(r"^\((\d+)\)\s+\S", line)
        if m:
            cur = int(m.group(1))
            blocks[cur] = line
        elif cur is not None:
            blocks[cur] = blocks[cur] + "\n" + line
    return blocks


def _subtree_ids(plan: str, node_id: int) -> list[int]:
    """Node ids strictly inside the subtree of tree node ``node_id``."""
    lines = _tree_lines(plan)
    idxs = [
        i for i, (_, t) in enumerate(lines) if re.search(rf"\({node_id}\)$", t)
    ]
    assert len(idxs) == 1, (node_id, idxs)
    i = idxs[0]
    col = lines[i][0]
    out: list[int] = []
    for j in range(i + 1, len(lines)):
        c, t = lines[j]
        if c <= col:
            break
        m = re.search(r"\((\d+)\)$", t)
        if m:
            out.append(int(m.group(1)))
    return out


@pytest.mark.parametrize(
    "query",
    [
        "incremental_dedup_new_batch",
        "incremental_dedup_persisted_index",
        "incremental_dedup_partitioned_text",
        "incremental_dedup_multi_segment_probe",
    ],
)
def test_incremental_dedup_tier3_tokenize_behind_candidate_semijoin(
    spark, sf_dir, query
):
    """Round-11 verdict #1: the tier-3 Jaccard verify must be
    candidate-proportional — every word-tokenize Generate
    (array_distinct(split(text)) is tier-3's signature expression;
    the band signatures use shingles) must sit ABOVE a LeftSemi join
    against the candidate-id set, so the corpus text is never
    re-tokenized (and never re-shuffled) per ingest."""
    from causality_between_elements_based_on_time_series_data_spark.lineage import (
        lineage_cuts_disabled,
    )
    from causality_between_elements_based_on_time_series_data_spark.plans import (
        REGISTRY,
    )

    with lineage_cuts_disabled():
        plan = _formatted_plan(REGISTRY[query].fn(spark, sf_dir))
    details = _detail_blocks(plan)
    tier3_gens = [
        nid
        for nid, txt in details.items()
        if txt.splitlines()[0].split()[1] == "Generate"
        and "array_distinct(split(text" in txt
    ]
    assert tier3_gens, "tier-3 tokenize Generate not found in plan"
    for nid in tier3_gens:
        sub = _subtree_ids(plan, nid)
        assert any("LeftSemi" in details[s] for s in sub), (
            query,
            nid,
            [details[s].splitlines()[0] for s in sub],
        )


@pytest.mark.parametrize(
    "query",
    [
        "incremental_dedup_partitioned_text",
        "incremental_dedup_multi_segment_probe",
    ],
)
def test_partitioned_text_tier3_fetch_is_dpp_pruned(spark, sf_dir, query):
    """Partitioned-text dedup probes: the tier-3 candidate text fetch
    must carry a dynamicpruningexpression on the partitioned text
    scan — the runtime subquery that keeps text partitions without
    candidates unread (candidate-proportional IO, not just
    candidate-proportional shuffle).  Round 14 extends the gate to
    the multi-segment probe (VERDICT r13 nit #3: its tier-3 fetch was
    compute-proportional but re-scanned the whole pruned text column
    per ingest).  Cuts disabled: the fetch sits beneath the tok_a
    checkpoint in the production plan."""
    from causality_between_elements_based_on_time_series_data_spark.lineage import (
        lineage_cuts_disabled,
    )
    from causality_between_elements_based_on_time_series_data_spark.plans import (
        REGISTRY,
    )

    with lineage_cuts_disabled():
        plan = _formatted_plan(REGISTRY[query].fn(spark, sf_dir))
    assert "dynamicpruning" in plan.lower(), plan


def test_compaction_occupancy_merge_has_zero_exchange(spark, sf_dir):
    """dedup_index_compaction: the occupancy merge (segment count
    aggregate + full-outer join against the persisted v1 counts) must
    plan with ZERO Exchange nodes — both children already carry the
    same bucket partitioning, which is the whole reason compaction
    merges counts instead of rewriting postings."""
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_llm import (
        _build_persisted_dedup_index,
        _merge_occupancy_counts,
        band_rows,
        portable_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx_docs = docs.filter(F.col("doc_id") % 5 != 0).select("doc_id", "text")
    _tb, t_counts, _tk, n_bkts = _build_persisted_dedup_index(
        spark, idx_docs, "test_cmp_idx"
    )
    t_seg = session_bucket_table(spark, "test_cmp_seg")
    reset_bucket_table(spark, t_seg)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        (
            band_rows(
                portable_signatures(
                    docs.filter(F.col("doc_id") % 5 == 0).select(
                        "doc_id", "text"
                    )
                )
            )
            .write.bucketBy(n_bkts, "band_id", "band_val")
            .sortBy("band_id", "band_val")
            .saveAsTable(t_seg)
        )
        # broadcast would bypass the claim — force the SMJ shape a
        # 100 TB counts table would get
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        merged = _merge_occupancy_counts(
            spark.table(t_counts), spark.table(t_seg)
        )
        plan = _formatted_plan(merged)
        assert "SortMergeJoin FullOuter" in plan, plan
        assert not re.search(r"\(\d+\)\s+Exchange", plan), plan
        assert plan.count("Bucketed: true") >= 2, plan
        # and the merge preserves posting mass
        tot = merged.agg(F.sum("n_total")).collect()[0][0]
        exp = (
            spark.table(t_counts).agg(F.sum("n_idx")).collect()[0][0]
            + spark.table(t_seg).count()
        )
        assert tot == exp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        for t in ("test_cmp_idx_bands", "test_cmp_idx_bcounts",
                  "test_cmp_idx_keys"):
            reset_bucket_table(spark, session_bucket_table(spark, t))
        reset_bucket_table(spark, t_seg)


def test_lifecycle_multiseg_merge_single_segment_side_exchange(
    spark, sf_dir
):
    """dedup_index_segment_lifecycle: the K-way read-time occupancy
    merge must plan with EXACTLY ONE Exchange, carrying segment-count
    mass only — per-segment aggregates run on their own bucketed
    scans with no Exchange below them, and the index counts scan
    feeds the FullOuter merge with no Exchange above it (the index is
    never re-shuffled).  This is the Spark-specific LSM finding: the
    chain can't be fully exchange-free (FOJ output partitioning is
    Unknown; Union drops bucketing), so the gate pins the minimal
    shape instead of an impossible zero."""
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_llm import (
        _build_persisted_dedup_index,
        _merge_occupancy_counts_multi,
        band_rows,
        portable_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx_docs = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id", "text"
    )
    _tb, t_counts, _tk, n_bkts = _build_persisted_dedup_index(
        spark, idx_docs, "test_lsm_idx"
    )
    seg_tables = []
    for j in range(3):
        t_seg = session_bucket_table(spark, f"test_lsm_seg{j}")
        reset_bucket_table(spark, t_seg)
        (
            band_rows(
                portable_signatures(
                    docs.filter(
                        (F.col("doc_id") % 5 == 0)
                        & (F.col("doc_id") % 3 == j)
                    ).select("doc_id", "text")
                )
            )
            .write.bucketBy(n_bkts, "band_id", "band_val")
            .sortBy("band_id", "band_val")
            .saveAsTable(t_seg)
        )
        seg_tables.append(t_seg)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the SMJ shape a 100 TB counts table would get
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        merged = _merge_occupancy_counts_multi(
            spark.table(t_counts),
            [spark.table(t) for t in seg_tables],
            n_bkts,
        )
        plan = _formatted_plan(merged)
        assert "SortMergeJoin FullOuter" in plan, plan
        ex_nodes = re.findall(r"\(\d+\)\s+Exchange", plan)
        assert len(ex_nodes) == 1, plan
        # the one Exchange sits below the Union->final-agg path, never
        # above the index counts scan: in the tree rendering the index
        # scan's branch under the FOJ must be Sort directly over Scan
        tree = plan.split("\n\n")[0]
        idx_branch = [
            ln for ln in tree.splitlines() if "bcounts" in ln.lower()
        ]
        assert idx_branch, tree
        assert "Scan parquet" in idx_branch[0], tree
        # every bucketed segment scan is read bucketed (exchange-free
        # per-segment aggregation)
        assert plan.count("Bucketed: true") >= 4, plan
        # and the merge preserves posting mass
        tot = merged.agg(F.sum("n_total")).collect()[0][0]
        exp = spark.table(t_counts).agg(F.sum("n_idx")).collect()[0][
            0
        ] + sum(spark.table(t).count() for t in seg_tables)
        assert tot == exp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        for t in ("test_lsm_idx_bands", "test_lsm_idx_bcounts",
                  "test_lsm_idx_keys"):
            reset_bucket_table(spark, session_bucket_table(spark, t))
        for t in seg_tables:
            reset_bucket_table(spark, t)


def assert_index_scans_unshuffled(plan, needle):
    """Every read of the ``needle`` index table must reach its
    SortMergeJoin with NO index-side re-shuffle (Filter / Project /
    local Sort allowed).  A BroadcastExchange is allowed only ABOVE a
    join in the chain — that broadcasts a probe-side join RESULT
    (bounded by the query sample), never the raw index scan; a
    shuffle Exchange anywhere, or a broadcast of the scan itself, is
    the regression."""
    for chain in ancestors_until_each(plan, needle, "SortMergeJoin"):
        seen_join = False
        for t in chain:  # nearest ancestor first
            if "BroadcastExchange" in t:
                assert seen_join, (needle, chain)
            elif "Exchange" in t:
                raise AssertionError((needle, chain))
            if "Join" in t:
                seen_join = True


def test_persisted_ann_probe_no_index_side_exchange(spark, sf_dir):
    """ann_sq8pc_persisted_topk: the probe must never re-shuffle the
    persisted ANN index — the bucketed codes scan reaches its joins
    with no Exchange (the broadcast query sample prunes in place), and
    the candidate→stats join is bucket-co-located on the child key
    ckl (the merged per-list stats table is JOINED, never broadcast,
    and arrives exchange-free because both sides are pre-bucketed at
    the same count).  The stats table is also read by the probe
    fan-out (_sq8_fan_to_children): that scan streams into a
    BroadcastHashJoin against the broadcast query sample and only the
    join RESULT is broadcast."""
    from causality_between_elements_based_on_time_series_data_spark.lineage import (
        lineage_cuts_disabled,
    )
    from causality_between_elements_based_on_time_series_data_spark.plans import (
        REGISTRY,
    )

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with lineage_cuts_disabled():
            plan = _formatted_plan(
                REGISTRY["ann_sq8pc_persisted_topk"].fn(spark, sf_dir)
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    for needle in ("annp_codes", "annp_stats"):
        assert_index_scans_unshuffled(plan, needle)
    # both index tables read through the bucketed-scan path
    assert plan.count("Bucketed: true") >= 2, plan


def test_persisted_ann_probe_matches_in_memory_tier(spark, sf_dir):
    """The persisted-index probe must answer BIT-IDENTICALLY to the
    in-memory per-cluster tier (same quantizer, same ranges, same
    integer ADC — only the physical layout differs), so recall gates
    proved for ann_sq8pc_ivf_topk transfer verbatim."""
    from causality_between_elements_based_on_time_series_data_spark.plans import (
        REGISTRY,
    )

    a = sorted(
        map(
            tuple,
            REGISTRY["ann_sq8pc_ivf_topk"].fn(spark, sf_dir).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            REGISTRY["ann_sq8pc_persisted_topk"].fn(spark, sf_dir).collect(),
        )
    )
    assert a == b and len(a) > 0
    # and to the in-memory SUB-SPLIT tier — the persisted index carries
    # the split geometry (round 15), answers unchanged by identity
    c = sorted(
        map(
            tuple,
            REGISTRY["ann_sq8pc_subsplit_topk"].fn(spark, sf_dir).collect(),
        )
    )
    assert a == c


def test_segmented_ann_probe_no_index_side_exchange(spark, sf_dir):
    """ann_sq8pc_segmented_probe: between folds the probe reads v1 +
    K delta-code segments — each per-table candidate join must be
    exchange-free on the index side (bucketed scan pruned in place by
    the broadcast sample; the union happens AFTER candidate
    generation, on candidate rows only — unioning the bucketed scans
    first would drop the bucketing and re-shuffle the index, the
    round-13 K-way-merge finding)."""
    from causality_between_elements_based_on_time_series_data_spark.lineage import (
        lineage_cuts_disabled,
    )
    from causality_between_elements_based_on_time_series_data_spark.plans import (
        REGISTRY,
    )

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with lineage_cuts_disabled():
            plan = _formatted_plan(
                REGISTRY["ann_sq8pc_segmented_probe"].fn(spark, sf_dir)
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    for needle in ("annsp_codes", "annsp_seg", "annsp_stats"):
        assert_index_scans_unshuffled(plan, needle)
    # v1 codes + 4 segments + the stats table read per branch: every
    # index-side scan goes through the bucketed path
    assert plan.count("Bucketed: true") >= 10, plan


def test_persisted_index_carries_subsplit_geometry(spark, sf_dir):
    """Round 15: the sub-split decision is part of the index VERSION —
    the PERSISTED codes table's occupancy distribution (grouped by its
    child key ckl) must show the actuator's effect: over-threshold
    mass 0 and max child occupancy equal to what
    ivf_subsplit_skew_report measures on the in-memory tier, and the
    persisted stats table must carry one row per child with parent
    ranges duplicated onto both children of every split list."""
    from causality_between_elements_based_on_time_series_data_spark.plans import (
        REGISTRY,
    )
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_llm import (
        _build_persisted_ann_index,
    )
    from causality_between_elements_based_on_time_series_data_spark.sources.catalog import (
        load_table as lt,
        reset_bucket_table,
    )

    emb = lt(spark, sf_dir, "embeddings")
    t_codes, t_stats, bits, _n = _build_persisted_ann_index(
        spark, emb, "annsubgeo"
    )
    try:
        rep = REGISTRY["ivf_subsplit_skew_report"].fn(spark, sf_dir).collect()[0]
        occ2 = (
            spark.table(t_codes)
            .groupBy("ckl")
            .agg(F.count("*").alias("occ"))
            .collect()
        )
        assert rep.n_split >= 1, rep  # fixture must exercise a split
        assert len(occ2) == rep.n_lists_after, (len(occ2), rep)
        assert max(r.occ for r in occ2) == rep.max_occ_after, rep
        # over-threshold mass on the PERSISTED layout (the before-mean
        # yardstick, exactly the report's integer predicate)
        over = sum(
            r.occ
            for r in occ2
            if 4 * r.occ * rep.n_lists_before > 5 * rep.n_vecs
        )
        assert over == rep.over_mass_after == 0, (over, rep)
        # stats: one row per child, split parents present on BOTH keys
        # with identical parent ranges
        stats = spark.table(t_stats).collect()
        assert len(stats) == rep.n_lists_after
        by_parent = {}
        for r in stats:
            by_parent.setdefault(r.cl, []).append(r)
        for cl, rows in by_parent.items():
            assert len(rows) == (2 if rows[0].is_split else 1), rows
            if len(rows) == 2:
                assert rows[0].mns == rows[1].mns
                assert rows[0].mxs == rows[1].mxs
                assert {r.ckl for r in rows} == {cl, cl + (1 << bits)}
    finally:
        for t in (t_codes, t_stats):
            reset_bucket_table(spark, t)


def test_subsplit_stats_join_streams_the_corpus(spark, sf_dir):
    """ann_sq8pc_subsplit_topk: the per-list stats join must plan as
    a SortMergeJoin (the merge hint — the production shape for a
    corpus-growing stats table) and the plan must contain NO
    BuildLeft broadcast join.  Regression pin for the round-14 10x
    defect: on unknown LogicalRDD statistics the planner broadcast
    the FACT side (BroadcastHashJoin Inner BuildLeft) and streamed
    the 1-partition checkpointed stats RDD, serializing the whole
    candidate/ADC pipeline into one task (70.9 s -> 11.9 s at x30
    after the fix).  BuildLeft can only reappear here by
    re-broadcasting a left-side fact relation — left-outer BHJs are
    BuildRight-only, and the query sample broadcast is an explicit
    right-side hint."""
    from causality_between_elements_based_on_time_series_data_spark.plans import (
        REGISTRY,
    )

    plan = _formatted_plan(
        REGISTRY["ann_sq8pc_subsplit_topk"].fn(spark, sf_dir)
    )
    assert "SortMergeJoin" in plan, plan
    assert "BuildLeft" not in plan, plan


def test_persisted_ann_serve_prunes_buckets(spark, sf_dir):
    """ann_sq8pc_persisted_serve: the literal probe-cluster IN-filter
    must prune unread buckets at the codes scan (SelectedBucketsCount
    strictly below the table's bucket count) — the serving-path claim
    that per-request IO is |probed lists|, not |corpus| (the x100
    full-scan term of the broadcast batch form, closed)."""
    from causality_between_elements_based_on_time_series_data_spark.plans import (
        REGISTRY,
    )

    plan = _formatted_plan(
        REGISTRY["ann_sq8pc_persisted_serve"].fn(spark, sf_dir)
    )
    # BOTH index scans (codes and ranges) prune to the probed buckets
    ms = re.findall(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert len(ms) >= 2, plan
    for sel, tot in ms:
        assert int(sel) < int(tot), plan
    # the codes scan reaches its first join in place (Filter only, no
    # Exchange); the ranges side legitimately broadcasts HERE — after
    # the literal filter it is bounded by the probed-list set, unlike
    # the batch form's corpus-growing stats table
    for chain in ancestors_until_each(plan, "annsv_codes", "Join"):
        assert not any("Exchange" in t for t in chain), chain


def test_segmented_ann_serve_prunes_all_tables(spark, sf_dir):
    """ann_sq8pc_segmented_serve: the literal child-key probe set must
    prune EVERY scanned table — v1 codes, each delta-code segment, and
    the stats reads (SelectedBucketsCount strictly below the bucket
    count on each) — per-request IO is |probed lists| x (K+1) tables,
    never |corpus|; and every codes scan reaches its first join in
    place (Filter only, no Exchange)."""
    from causality_between_elements_based_on_time_series_data_spark.plans import (
        REGISTRY,
    )

    plan = _formatted_plan(
        REGISTRY["ann_sq8pc_segmented_serve"].fn(spark, sf_dir)
    )
    ms = re.findall(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    # v1 codes + 4 segments + their stats reads
    assert len(ms) >= 6, plan
    for sel, tot in ms:
        assert int(sel) < int(tot), plan
    for needle in ("annss_codes", "annss_seg"):
        assert needle in plan, plan
        for chain in ancestors_until_each(plan, needle, "Join"):
            assert not any("Exchange" in t for t in chain), (needle, chain)


def test_batch_probe_literal_route_prunes_and_matches(spark, sf_dir):
    """_ann_batch_probe (ann_sq8pc_batch_pruned_topk's engine): a
    sparse batch (one query) must take the LITERAL route — index scans
    bucket-prune to the unioned probe set — and answer exactly the
    broadcast tier's rows for that query (the routes are
    candidate-identical; only IO differs)."""
    from causality_between_elements_based_on_time_series_data_spark.plans import (
        REGISTRY,
    )
    from causality_between_elements_based_on_time_series_data_spark.plans.queries_llm import (
        _ann_batch_probe,
        _build_persisted_ann_index,
        _sq8_probe_set,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    t_codes, t_stats, bits, _n = _build_persisted_ann_index(
        spark, emb, "annbl"
    )
    try:
        qs1 = _sq8_probe_set(emb, bits).filter(F.col("qid") == 0)
        out = _ann_batch_probe(spark, t_codes, t_stats, bits, qs1)
        plan = _formatted_plan(out)
        ms = re.findall(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert len(ms) >= 2, plan  # codes AND stats scans prune
        for sel, tot in ms:
            assert int(sel) < int(tot), plan
        got = sorted(map(tuple, out.collect()))
        full = sorted(
            t
            for t in map(
                tuple,
                REGISTRY["ann_sq8pc_persisted_topk"]
                .fn(spark, sf_dir)
                .collect(),
            )
            if t[0] == 0
        )
        assert got == full and len(got) == 3
    finally:
        for t in (t_codes, t_stats):
            reset_bucket_table(spark, t)
