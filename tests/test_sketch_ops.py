"""Structural-guarantee tests for the probabilistic-filter operators:
count-min sketch (est >= true, always) and Bloom semi-join pruning
(no false negatives, ever).  Value parity vs DuckDB is the driver
contract's job — both queries are fully oracled.
"""
from __future__ import annotations

from causality_between_elements_based_on_time_series_data_spark.plans.queries_dataops import (
    bloom_semijoin_prune,
)
from causality_between_elements_based_on_time_series_data_spark.plans.queries_llm import (
    countmin_heavy_hitters,
)


def test_countmin_never_underestimates(spark, sf_dir):
    rows = countmin_heavy_hitters(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.overestimate >= 0, r
        assert r.est_count == r.true_count + r.overestimate
        assert r.true_count > 0


def test_bloom_has_no_false_negatives(spark, sf_dir):
    rows = bloom_semijoin_prune(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # every true member passes the filter, so pass-count decomposes
        # exactly into members + false positives
        assert r.n_bloom_pass == r.n_true_match + r.n_false_positive, r
        assert 0 <= r.n_true_match <= r.n_orders
        assert r.n_false_positive >= 0
