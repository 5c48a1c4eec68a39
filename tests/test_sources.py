"""Source-catalog contracts: fixture loading must be environment-
independent — in particular, events timestamps are UTC instants no
matter what spark.sql.session.timeZone a consumer session runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from causality_between_elements_based_on_time_series_data_spark.sources.catalog import load_table


def _instant_range(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    r = df.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
        F.count("*").alias("n"),
    ).collect()[0]
    return r.mn, r.mx, r.n


def test_events_ts_instants_are_session_timezone_independent(spark, sf_dir):
    """The NTZ->TIMESTAMP bridge in load_table must preserve instants
    under a foreign session timezone (a plain cast would shift every
    event by the tz offset; round 5 shipped exactly that assumption,
    gated only by a comment)."""
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    utc = _instant_range(spark, sf_dir)
    try:
        for tz in ("America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            assert _instant_range(spark, sf_dir) == utc, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
