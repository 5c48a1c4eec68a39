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


def test_rp_adaptive_bits_matches_sql_and_bounds_buckets():
    """The adaptive IVF bit count must be engine-identical: the Python
    derivation (driver side) and the bin()-length SQL formula (oracle
    side) agree for n across six orders of magnitude, and the implied
    average inverted list stays <= the target bucket size until the
    plane-count cap."""
    import duckdb

    from causality_between_elements_based_on_time_series_data_spark.plans.queries_llm import (
        _IVF_MAX_BITS,
        _IVF_TARGET_BUCKET,
        _rp_adaptive_bits,
    )

    t = _IVF_TARGET_BUCKET
    for n in [1, 100, 256, 257, 511, 512, 513, 767, 768, 2000, 2048,
              60000, 10**6, 10**8, 10**10]:
        sql = (
            f"SELECT least(greatest(3, CASE WHEN (({n} + {t - 1}) // {t}) <= 1"
            f" THEN 0 ELSE length(bin((({n} + {t - 1}) // {t}) - 1)) END),"
            f" {_IVF_MAX_BITS})"
        )
        bits = _rp_adaptive_bits(n)
        assert duckdb.sql(sql).fetchone()[0] == bits, n
        assert 3 <= bits <= _IVF_MAX_BITS
        if bits < _IVF_MAX_BITS:
            assert n <= t * (1 << bits), (n, bits)
