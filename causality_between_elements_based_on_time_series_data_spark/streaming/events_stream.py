"""Structured Streaming skin over the events table (SURVEY.md §2.9).

The reference is pure batch (model.py's loop over in-memory numpy),
so streaming is an engine extension: the same tumbling-window rollup
as the batch ``tumbling_hourly_rollup`` query, expressed as a
readStream → windowed agg → memory sink pipeline.  Batch/stream
parity is the correctness claim — the streaming result must equal the
batch GROUP BY date_trunc('hour') exactly, which is what the DuckDB
oracle checks.

For local runs the parquet fixture drives the stream to completion
synchronously (``processAllAvailable``); on a real cluster the source
would be Kafka/files-in-arrival and the sink a Delta/parquet append
with ``foreachBatch``.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import scoped_conf
from ..sources.catalog import TABLES

_NANOS_FLAG = "spark.sql.legacy.parquet.nanosAsLong"

# TIMESTAMP(NANOS)-vintage fixtures: the stream source reads ts as
# nanos-since-epoch and converts (see _stream_events / load_table).
_STREAM_SCHEMA = T.StructType(
    [
        T.StructField(f.name, T.LongType() if f.name == "ts" else f.dataType)
        for f in TABLES["events"].fields
    ]
)


def _events_ts_is_nanos(spark: SparkSession, sf_dir: str) -> bool:
    """Probe the fixture vintage (schema-only batch read, no data
    scan): TIMESTAMP(NANOS) fixtures surface ts as bigint under the
    nanos flag; TIMESTAMP(MICROS) fixtures surface a timestamp."""
    with scoped_conf(spark, _NANOS_FLAG, "true"):
        sch = spark.read.parquet(f"{sf_dir}/events.parque*").dtypes
    return dict(sch).get("ts") == "bigint"


def _stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over the events fixture with ts normalized to
    TIMESTAMP whatever the fixture vintage — the streaming mirror of
    catalog.load_table.  For the nanos vintage the caller must hold
    _NANOS_FLAG for the stream's whole run-to-completion (micro-
    batches re-plan the file scan); for the micros vintage the
    declared TimestampType schema reads directly and the flag is
    inert.  ``max_files_per_trigger`` splits a multi-file fixture
    into one micro-batch per file (multi-batch/out-of-order tests)."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if _events_ts_is_nanos(spark, sf_dir):
        return (
            reader.schema(_STREAM_SCHEMA)
            .parquet(f"{sf_dir}/events.parque*")
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    return reader.schema(TABLES["events"]).parquet(f"{sf_dir}/events.parque*")


def streaming_tumbling_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the 1-hour tumbling rollup as a real streaming query and
    return the (batch) result table."""
    # Glob rather than a bare file path: the file stream source requires
    # a directory basePath; the glob's non-glob prefix (sf_dir) is it.
    # The nanos flag is scoped to the whole run-to-completion — micro-
    # batches re-plan the file scan, so it must hold until the stream
    # stops (unlike batch reads, which capture their conf at read time).
    with scoped_conf(spark, _NANOS_FLAG, "true"):
        stream = (
            _stream_events(spark, sf_dir)
            .withWatermark("ts", "1 hour")
        )
        agg = (
            stream.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 4).alias("total_value"),
            )
        )
        name = f"stream_rollup_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    out = spark.table(name)
    return out.select(
        "event_type",
        F.col("win.start").alias("hour_start"),
        "n",
        "total_value",
    )


def streaming_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running (count, sum) state, emitted on update — the
    engine's arbitrary-state surface (SURVEY §2.9 engine decision;
    the reference's closest analog is TF's streaming AUC accumulator,
    model.py:157). With the fixture driven in one micro-batch the
    emitted state equals the batch GROUP BY — the oracle checks that.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        # self-contained kernel: stdlib + pandas only (worker sys.path)
        import pandas as _pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "total_value": [round(total, 4)]}
        )

    with scoped_conf(spark, _NANOS_FLAG, "true"):
        stream = _stream_events(spark, sf_dir)
        out = (
            stream.groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType="user_id long, n long, total_value double",
                stateStructType="n long, total double",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        name = f"stream_state_{uuid.uuid4().hex[:8]}"
        q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    # one emission per user per micro-batch; keep the row from the
    # LATEST emission (max n — n is monotone per user).  Column-wise
    # max(n), max(total_value) would be wrong if the source ever split
    # the fixture into multiple micro-batches: value is signed, so the
    # running sum is not monotone and max(total_value) could come from
    # an earlier emission than max(n) — a state that never existed.
    latest = spark.table(name).groupBy("user_id").agg(
        F.max("n").alias("n"),
        F.expr("max_by(total_value, n)").alias("total_value"),
    )
    return latest


def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact deduplication: the event stream unioned with
    itself (every event arrives twice — the at-least-once-delivery
    case) is deduplicated on event_id with
    ``dropDuplicatesWithinWatermark`` — state is bounded by the
    watermark horizon instead of growing forever, the property that
    makes streaming dedup viable at 100 TB/day.  The deduped append
    stream is then batch-aggregated per event_type; parity target is
    the plain batch GROUP BY (duplicates fully removed).
    """
    with scoped_conf(spark, _NANOS_FLAG, "true"):

        def src():
            return (
                _stream_events(spark, sf_dir)
            )

        dup_stream = src().union(src()).withWatermark("ts", "1 hour")
        deduped = dup_stream.dropDuplicatesWithinWatermark(["event_id"])
        name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
        q = deduped.writeStream.outputMode("append").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


def streaming_session_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (30-min gap) per user — the one §2.9
    window shape whose batch form (``session_window_rollup``) needed a
    streaming skin.  Session windows merge as events arrive, so state
    per (user, open session) is bounded by the watermark horizon;
    complete-mode memory sink for the run-to-completion fixture drive.
    Parity target: the batch ``session_window`` aggregate.
    """
    with scoped_conf(spark, _NANOS_FLAG, "true"):
        stream = (
            _stream_events(spark, sf_dir)
            .withWatermark("ts", "1 hour")
        )
        agg = stream.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        ).agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("session_value"))
        name = f"stream_session_{uuid.uuid4().hex[:8]}"
        q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name).select(
        "user_id",
        F.unix_micros(F.col("sw.start")).alias("session_start_us"),
        "n_events",
        "session_value",
    )


def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join — the hard stateful-streaming op:
    purchases joined to the same user's clicks in the preceding 30
    minutes, both sides watermarked so join state is bounded (clicks
    older than purchase-watermark − 30 min are evicted).  The joined
    append stream lands in a memory sink; the returned DataFrame
    batch-aggregates it per event pair's user, and must equal the
    equivalent batch interval join — stream/batch join parity.
    """
    with scoped_conf(spark, _NANOS_FLAG, "true"):

        def src():
            return (
                _stream_events(spark, sf_dir)
            )

        clicks = (
            src().filter(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
                F.col("value").alias("c_value"),
            )
            .withWatermark("c_ts", "1 hour")
        )
        purchases = (
            src().filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
                F.col("event_id").alias("p_event"),
            )
            .withWatermark("p_ts", "1 hour")
        )
        joined = purchases.join(
            clicks,
            F.expr(
                "p_user = c_user AND "
                "c_ts >= p_ts - INTERVAL 30 MINUTES AND c_ts < p_ts"
            ),
        )
        name = f"stream_ivjoin_{uuid.uuid4().hex[:8]}"
        q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return (
        spark.table(name)
        .groupBy(F.col("p_user").alias("user_id"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("p_event").alias("n_purchases_with_click"),
            F.round(F.sum("c_value"), 4).alias("clicked_value"),
        )
    )


def streaming_static_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static (enrichment) join: the event stream joined to the
    static customer dimension — the planner re-reads the static side
    per micro-batch and broadcasts it when small; no join state at
    all (the static side is not stateful).  Parity: the same join in
    batch.
    """
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    with scoped_conf(spark, _NANOS_FLAG, "true"):
        stream = (
            _stream_events(spark, sf_dir)
        )
        enriched = stream.join(F.broadcast(cust), stream.user_id == cust.c_custkey)
        agg_src = enriched.groupBy("c_mktsegment", "event_type").agg(
            F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value")
        )
        name = f"stream_dimjoin_{uuid.uuid4().hex[:8]}"
        q = (
            agg_src.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)


def streaming_foreachbatch_parquet_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The foreachBatch escape hatch — THE production streaming sink
    pattern (exactly-once-per-batch appends to any batch writer, here
    parquet).  The stream's projected rows land in a parquet target
    per micro-batch; the returned DataFrame batch-aggregates the sink
    contents, which must equal the plain batch GROUP BY over the
    source — sink round-trip parity.  On a cluster the target would
    be object storage and the checkpoint a durable path.
    """
    import tempfile

    out = tempfile.mkdtemp(prefix="stream_fb_sink_")
    ckpt = tempfile.mkdtemp(prefix="stream_fb_ckpt_")

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(f"{out}/data")

    with scoped_conf(spark, _NANOS_FLAG, "true"):
        stream = (
            _stream_events(spark, sf_dir)
            .select("event_id", "event_type", "value")
        )
        q = (
            stream.writeStream.foreachBatch(append_batch)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return (
        spark.read.parquet(f"{out}/data")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


def streaming_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour windows advancing hourly — each event lands in
    two windows; complete-mode memory sink."""
    with scoped_conf(spark, _NANOS_FLAG, "true"):
        stream = (
            _stream_events(spark, sf_dir)
            .withWatermark("ts", "1 hour")
        )
        agg = stream.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("win"), "event_type"
        ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        name = f"stream_sliding_{uuid.uuid4().hex[:8]}"
        q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name).select(
        "event_type",
        F.unix_micros(F.col("win.start")).alias("window_start_us"),
        "n",
        "total_value",
    )


def streaming_append_finalized(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Tumbling rollup in APPEND output mode: a window row is emitted
    exactly once, only after the event-time watermark passes the
    window end — the late-data-safe mode a production parquet/Delta
    sink requires (complete mode rewrites the world; update mode
    re-emits).  Driven to completion, the emitted set is every window
    whose end <= final watermark (max event time - 1h delay); the
    still-open tail windows stay in state and are NOT emitted.  The
    no-data flush micro-batch (on by default) makes this deterministic
    for a finite fixture."""
    with scoped_conf(spark, _NANOS_FLAG, "true"):
        stream = (
            _stream_events(spark, sf_dir, max_files_per_trigger=max_files_per_trigger)
            .withWatermark("ts", "1 hour")
        )
        agg = stream.groupBy(
            F.window("ts", "1 hour").alias("win"), "event_type"
        ).agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        name = f"stream_append_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name).select(
        "event_type",
        F.unix_micros(F.col("win.start")).alias("window_start_us"),
        "n",
        "total_value",
    )


def streaming_pairwise_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The causality suite's hour x series grid maintained BY THE
    STREAM: the tumbling 1h rollup runs in append mode (finalized
    windows only, the production-sink discipline of
    streaming_append_finalized), and pairwise Pearson correlation is
    computed over the emitted grid — the incremental form of the
    batch ``pairwise_series_correlation`` screen.  Parity target: the
    batch grid restricted to windows the final watermark closed
    (hour + 2h <= max ts).  At scale the stream holds |open windows|
    x |series| state; the pair join runs on the tiny emitted grid,
    exactly like the batch path."""
    with scoped_conf(spark, _NANOS_FLAG, "true"):
        stream = _stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
        agg = stream.groupBy(
            F.window("ts", "1 hour").alias("win"), "event_type"
        ).agg(F.round(F.sum("value"), 6).alias("v"))
        name = f"stream_corr_grid_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    # disjoint column names per side: both legs read the same memory
    # sink plan, so alias-qualified self-join refs are ambiguous
    a = spark.table(name).select(
        F.col("win.start").alias("h_a"),
        F.col("event_type").alias("series_a"),
        F.col("v").alias("va"),
    )
    b = spark.table(name).select(
        F.col("win.start").alias("h_b"),
        F.col("event_type").alias("series_b"),
        F.col("v").alias("vb"),
    )
    return (
        a.join(
            b,
            (F.col("h_a") == F.col("h_b"))
            & (F.col("series_a") < F.col("series_b")),
        )
        .groupBy("series_a", "series_b")
        .agg(
            F.round(F.corr("va", "vb"), 4).alias("pearson_r"),
            F.count("*").alias("n_hours"),
        )
    )


def streaming_merge_upsert(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming CDC sink: each micro-batch of the event stream is
    MERGEd into a per-user dimension table via foreachBatch — the
    production upsert-into-parquet pattern (no transactional format
    needed: anti-join + union + partition-wise overwrite, see
    operators/upsert.py).  Per user the LATEST event's value and ts
    win, with event_id as the deterministic tiebreak at equal ts —
    carried through the state table so ties resolve identically within
    and across micro-batches; late/duplicate micro-batches converge
    because the merge is idempotent on (user_id, last_ts,
    last_event_id).  Parity target: the batch max_by(value, (ts,
    event_id)) per user over the whole fixture — the state a CDC
    consumer would have after draining the topic.

    Crash safety: each batch writes a NEW version directory, then
    atomically repoints a _CURRENT file (os.replace) at it — readers
    always see a complete version, a crash at any step leaves the
    previous version live, and only a successful swap garbage-collects
    the superseded one.  Missing state is detected by the pointer
    file's absence, never by swallowing read errors — a corrupt or
    transiently unreadable state table raises instead of silently
    resetting accumulated state."""
    import os
    import tempfile

    state_dir = tempfile.mkdtemp(prefix="stream_merge_state_")
    ckpt = tempfile.mkdtemp(prefix="stream_merge_ckpt_")
    pointer = f"{state_dir}/_CURRENT"

    def current_version() -> str | None:
        # explicit existence check — NOT try/except around the parquet
        # read: any failure reading a version the pointer names is a
        # real error and must surface
        if not os.path.exists(pointer):
            return None
        with open(pointer) as fh:
            return f"{state_dir}/{fh.read().strip()}"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # reduce the batch to one row per user (latest by ts,event_id)
        upd = batch_df.groupBy("user_id").agg(
            F.expr("max_by(value, struct(ts, event_id))").alias("last_value"),
            F.max("ts").alias("last_ts"),
            F.expr("max_by(event_id, struct(ts, event_id))").alias("last_event_id"),
        )
        # conditional MERGE — newest wins: union with the current
        # state and re-reduce, so an out-of-order micro-batch can
        # never clobber newer state (idempotent, order-robust; the
        # unconditional updates-win form is operators/upsert.py's
        # merge_upsert, exercised by merge_upsert_customers)
        cur = current_version()
        if cur is not None:
            both = batch_df.sparkSession.read.parquet(cur).unionByName(upd)
        else:
            both = upd  # first batch: pointer not yet written
        merged = both.groupBy("user_id").agg(
            F.expr("max_by(last_value, struct(last_ts, last_event_id))").alias("last_value"),
            F.max("last_ts").alias("last_ts"),
            F.expr("max_by(last_event_id, struct(last_ts, last_event_id))").alias(
                "last_event_id"
            ),
        )
        # versioned write + atomic pointer swap (parquet can't
        # read+overwrite in place, and delete-then-move leaves no
        # target if interrupted between the two)
        version = f"users_v{batch_id}"
        merged.write.mode("overwrite").parquet(f"{state_dir}/{version}")
        tmp = f"{pointer}.tmp.{batch_id}"
        with open(tmp, "w") as fh:
            fh.write(version)
        os.replace(tmp, pointer)  # atomic on POSIX
        if cur is not None and cur != f"{state_dir}/{version}":
            import shutil

            shutil.rmtree(cur, ignore_errors=True)  # GC superseded version

    with scoped_conf(spark, _NANOS_FLAG, "true"):
        stream = _stream_events(
            spark, sf_dir, max_files_per_trigger=max_files_per_trigger
        ).select("user_id", "ts", "event_id", "value")
        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    final = current_version()
    assert final is not None, "stream produced no batches"
    return (
        spark.read.parquet(final)
        .select(
            "user_id",
            F.round("last_value", 4).alias("last_value"),
            F.unix_micros("last_ts").alias("last_ts_us"),
        )
    )


def streaming_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals via Spark 4's transformWithState
    (StatefulProcessor + typed ValueState): the successor API to
    applyInPandasWithState — explicit state variables, TTL/timers,
    and a RocksDB-backed store (required by the API; scoped here).
    The processor accumulates (n, total) per user and emits the
    updated pair each batch; with the fixture driven to completion
    the last emission per user equals the batch GROUP BY, which is
    the oracle's check.  The processor class is self-contained
    (imports inside methods) — workers cannot import this repo.

    ENVIRONMENT GATE: the transformWithState Python runner speaks
    protobuf to the JVM; this container ships no usable
    ``google.protobuf``, so the op raises a descriptive ImportError
    here and is exercised only where the dependency exists.  It is
    deliberately NOT in the driver-facing registry —
    ``streaming_stateful_user_totals`` covers stateful streaming via
    the protobuf-free applyInPandasWithState API."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithState requires the google.protobuf python "
            "package (Spark's streaming python-runner protocol); it is "
            "not available in this environment"
        ) from e

    import pandas as pd  # noqa: F401 - re-imported inside the kernel

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState("agg", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, total = (self.state.get() if self.state.exists() else (0, 0.0))
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self.state.update((n, float(total)))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    with scoped_conf(spark, _NANOS_FLAG, "true"), scoped_conf(
        spark, "spark.sql.streaming.stateStore.providerClass", rocks
    ):
        stream = (
            _stream_events(spark, sf_dir)
        )
        out = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType="user_id BIGINT, n BIGINT, total_value DOUBLE",
            outputMode="Update",
            timeMode="None",
        )
        name = f"stream_tws_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    # update mode re-emits a user's row every batch it changes in;
    # the final state is the row with the maximal n per user
    final = spark.table(name).groupBy("user_id").agg(
        F.max_by("total_value", "n").alias("raw_total"),
        F.max("n").alias("n"),
    )
    return final.select(
        "user_id", "n", F.round("raw_total", 4).alias("total_value")
    ).orderBy("user_id")


def streaming_psi_monitor(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming drift monitor: the period-1 reference histogram is
    computed batch-side (ts < 2024-01-16), then the live period-2
    traffic streams through a complete-mode per-bin count — the
    running histogram a monitor dashboard would poll — and the final
    PSI against the reference is computed from the last emitted state.
    Bin edges come from the global value bounds (two scalars, fetched
    once before the stream starts — static config, like any deployed
    monitor's binning).  Draining the same fixture the batch query
    reads, the final PSI equals psi_value_drift exactly, so the whole
    streaming path carries a FULL value oracle (not just rows-only).
    """
    from ..sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx")).first()
    mn, mx = float(b["mn"]), float(b["mx"])
    width = (mx - mn) / 10
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")

    def to_bin(col):
        return F.least(F.lit(9), F.floor((col - F.lit(mn)) / F.lit(width)).cast("int"))

    grid = spark.range(0, 10).select(F.col("id").cast("int").alias("bin"))
    c1 = (
        ev.filter(F.col("ts") < cutoff)
        .select(to_bin(F.col("value")).alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("c1_part"))
    )
    c1 = grid.join(c1, "bin", "left").select(
        "bin", F.coalesce(F.col("c1_part"), F.lit(0)).cast("double").alias("c1")
    )

    with scoped_conf(spark, _NANOS_FLAG, "true"):
        stream = (
            _stream_events(spark, sf_dir, max_files_per_trigger=max_files_per_trigger)
            .filter(F.col("ts") >= cutoff)
            .select(to_bin(F.col("value")).alias("bin"))
        )
        counts = stream.groupBy("bin").agg(F.count("*").alias("c2_part"))
        name = f"stream_psi_{uuid.uuid4().hex[:8]}"
        q = (
            counts.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    c2 = grid.join(spark.table(name), "bin", "left").select(
        "bin", F.coalesce(F.col("c2_part"), F.lit(0)).cast("double").alias("c2")
    )
    counts_all = c1.join(c2, "bin")
    tot = counts_all.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    q1 = (F.col("c1") + 1) / (F.col("n1") + 10)
    q2 = (F.col("c2") + 1) / (F.col("n2") + 10)
    return counts_all.crossJoin(F.broadcast(tot)).agg(
        F.round(F.sum((q2 - q1) * F.log(q2 / q1)), 6).alias("psi"),
        F.max("n1").cast("bigint").alias("n_period1"),
        F.max("n2").cast("bigint").alias("n_period2"),
    )


def streaming_topk_trending(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Trending elements: the stream maintains the hour x type count
    table in complete mode (the state a serving layer would hold);
    the top-k rank per window is applied to the maintained table —
    ranking is not an incremental streaming operator, and the
    production split is exactly this: counts in the stream, ranks at
    read time.  Parity target: batch hourly counts + row_number."""
    from pyspark.sql import Window

    with scoped_conf(spark, _NANOS_FLAG, "true"):
        stream = _stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
        agg = stream.groupBy(
            F.window("ts", "1 hour").alias("win"), "event_type"
        ).agg(F.count("*").cast("bigint").alias("n"))
        name = f"stream_trend_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    out = spark.table(name).select(
        F.col("win.start").alias("hour_start"), "event_type", "n"
    )
    w = Window.partitionBy("hour_start").orderBy(F.desc("n"), "event_type")
    return (
        out.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .orderBy("hour_start", "rnk")
    )


def streaming_page_hinkley(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming sequential drift monitor: the per-day mean-value
    table is maintained by a complete-mode streaming aggregation (the
    state a drift dashboard holds), and the Page-Hinkley detector —
    running mean, cumulative deviation, running-min excess, the
    data-driven lambda — is computed from the final emitted state by
    the SAME window chain as the batch query
    (plans/queries_panel._page_hinkley_chain).  Draining the fixture
    the batch query reads, the result equals page_hinkley_drift
    exactly, so the streaming path carries a FULL value oracle.
    Detection semantics note: PH's excess statistic is monotone in
    new days only — recomputing it from the maintained day table on
    each poll yields the same alarms an incremental evaluator would
    raise, which is why the split (means in the stream, detector at
    read time) is the production shape, like streaming_topk_trending.
    """
    from ..plans.queries_panel import _page_hinkley_chain

    with scoped_conf(spark, _NANOS_FLAG, "true"):
        stream = _stream_events(
            spark, sf_dir, max_files_per_trigger=max_files_per_trigger
        )
        daily = stream.groupBy(
            F.datediff(
                F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01")
            ).alias("day")
        ).agg(F.round(F.avg("value"), 6).alias("x"))
        name = f"stream_ph_{uuid.uuid4().hex[:8]}"
        q = (
            daily.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    return _page_hinkley_chain(spark.table(name))


def streaming_corpus_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time corpus quality gate as a stream: documents arrive as
    files (the crawl-delivery shape), every micro-batch applies the
    SAME stateless per-row heuristic gate as `corpus_build_funnel`
    stage 1 (token-count window + distinct-token ratio), and a running
    per-language acceptance rollup (complete mode) reports docs seen /
    kept / kept-set checksum.  Stateless gating + an aggregate whose
    state is |langs|-bounded: the streaming form is exactly the batch
    plan fed incrementally, so the fixture-driven run must equal the
    batch GROUP BY bit-for-bit — the oracle checks that.  At scale the
    memory sink becomes a foreachBatch parquet/CDC append and the gate
    rides inside the ingest job, upstream of dedup."""
    from ..functions.text import corpus_quality_keep
    from ..sources.catalog import TABLES

    docs = spark.readStream.schema(TABLES["documents"]).parquet(
        f"{sf_dir}/documents.parque*"
    )
    keep = corpus_quality_keep(F.col("text"))
    agg = (
        docs.select("lang", "doc_id", keep.alias("k"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.col("k").cast("int")).cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("k"), F.col("doc_id")))
            .cast("bigint")
            .alias("kept_id_checksum"),
        )
    )
    name = f"stream_quality_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).orderBy("lang")


def streaming_eval_decontamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ingest-time benchmark decontamination as a stream: training
    documents arrive as files, every micro-batch explodes their
    13-token md5 windows and LEFT-SEMI joins them against the STATIC
    eval-suite window set (stream-static semi joins are exactly the
    supported shape for this — the eval benchmark ships separately
    from the crawl and changes rarely, so it is a static relation the
    stream probes).  Stateful footprint: one groupBy(lang, doc_id)
    aggregate over MATCHED windows only — the semi join filters
    first, so state is bounded by contaminated docs, not the stream.
    The per-language rollup (train totals + clean-set checksum)
    happens at read time over the emitted per-doc state joined with
    the batch-side totals, the same "aggregate in the stream,
    finalize at read time" pattern as streaming_page_hinkley — and
    the result must equal the batch `eval_decontamination` semantics
    bit-for-bit, which the oracle hash-checks.  At scale the memory
    sink becomes a foreachBatch append to the quarantine table and
    the gate rides inside the ingest job.
    """
    # single source of truth for the n-gram width — the registration's
    # oracle (plans/queries_ml.py) and the batch eval_decontamination
    # derive from the same constant, so the three can't desynchronize
    from ..plans.queries_llm import _DECON_W as w
    from ..sources.catalog import load_table

    def windows(df: DataFrame) -> DataFrame:
        arrs = df.select(
            "doc_id", "lang", F.split("text", " ").alias("toks")
        ).filter(F.size("toks") >= w)
        return arrs.select(
            "doc_id",
            "lang",
            F.explode(
                F.sequence(F.lit(1), F.size("toks") - w + 1)
            ).alias("i"),
            "toks",
        ).select(
            "doc_id",
            "lang",
            F.md5(
                F.array_join(F.slice("toks", F.col("i"), w), " ")
            ).alias("wh"),
        )

    is_eval = (F.col("doc_id") % 20) == 3
    docs_static = load_table(spark, sf_dir, "documents")
    ev = windows(docs_static.filter(is_eval)).select("wh").distinct()

    stream = spark.readStream.schema(TABLES["documents"]).parquet(
        f"{sf_dir}/documents.parque*"
    )
    matched = windows(stream.filter(~is_eval)).join(ev, "wh", "left_semi")
    per_doc = matched.groupBy("lang", "doc_id").agg(
        F.count("*").cast("bigint").alias("n_hit_windows")
    )

    name = f"stream_decon_{uuid.uuid4().hex[:8]}"
    q = (
        per_doc.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    hits = spark.table(name)
    train = docs_static.filter(~is_eval).select("doc_id", "lang")
    flagged = F.col("n_hit_windows").isNotNull()
    return (
        train.join(hits.select("doc_id", "n_hit_windows"), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_train"),
            F.sum(flagged.cast("int")).cast("bigint").alias(
                "n_contaminated"
            ),
            F.sum(F.coalesce("n_hit_windows", F.lit(0)))
            .cast("bigint")
            .alias("hit_windows"),
            F.sum(F.when(~flagged, F.col("doc_id"))).cast("bigint").alias(
                "clean_id_checksum"
            ),
        )
        .orderBy("lang")
    )


def streaming_incremental_dedup_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-ingest dedup report as the batch STREAMS in, probing the
    PERSISTED index: the index tables (sha2 keys, band postings,
    occupancy counts) are built once batch-side — they are the static
    relations a recurring ingest probes — and arriving documents flow
    through foreachBatch, where each micro-batch runs tier 1 (exact
    sha2 semi-join against the bucketed key table) and tier 2 (band
    signatures semi-joined against the index's guarded buckets) with
    full batch semantics, writing a |langs|-bounded report fragment
    into a parquet accumulator KEYED BY batch_id (overwrite-per-batch
    directory, so a replayed micro-batch replaces its own fragment —
    the rollup is idempotent under foreachBatch's at-least-once
    replay contract); the returned DataFrame sums the fragments.  Per-doc verdicts depend only on (doc, static index),
    so the rollup is micro-batch-partitioning-independent and equals
    the one-shot batch computation bit-for-bit — the oracle
    hash-checks that.  DESIGN NOTE vs incremental_dedup_new_batch:
    the hot-bucket guard here sees INDEX-side occupancy only (the
    stream cannot know the whole batch's occupancy mid-flight);
    batch-side occupancy refinement and the tier-3 Jaccard verify
    remain the batch probe's job — flagged candidates quarantine for
    it.  Tier-3 in-stream would need candidate text joins per
    micro-batch (possible in foreachBatch, linear extra cost, no new
    semantics).  At scale the accumulator is the quarantine/report
    table in object storage and foreachBatch rides the ingest job.
    """
    import tempfile

    from pyspark.sql import functions as F

    from ..plans.queries_llm import (
        _MH_MAX_BUCKET,
        _build_persisted_dedup_index,
        band_rows,
        portable_signatures,
    )
    from ..sources.catalog import TABLES, load_table

    docs = load_table(spark, sf_dir, "documents")
    t_split = docs.agg(
        F.floor(0.8 * (F.max("doc_id") + 1)).cast("bigint")
    ).first()[0]
    _tb, t_counts, t_keys, _nb = _build_persisted_dedup_index(
        spark,
        docs.filter(F.col("doc_id") < t_split).select("doc_id", "text"),
        "stream_idx",
    )
    # guarded index buckets: exists-in-index AND occupancy <= guard
    # (the counts table holds every index bucket, so one filtered
    # semi-join source covers both conditions)
    ok_idx = spark.table(t_counts).filter(
        F.col("n_idx") <= _MH_MAX_BUCKET
    ).select("band_id", "band_val")

    out = tempfile.mkdtemp(prefix="stream_incdedup_sink_")
    ckpt_dir = tempfile.mkdtemp(prefix="stream_incdedup_ckpt_")

    def probe_batch(bdf: DataFrame, batch_id: int) -> None:
        part = bdf.select("doc_id", "lang", "text")
        exact = (
            part.select("doc_id", F.sha2("text", 256).alias("h"))
            .join(spark.table(t_keys), "h", "semi")
            .select("doc_id")
            .withColumn("_e", F.lit(1))
        )
        cand = (
            band_rows(portable_signatures(part.select("doc_id", "text")))
            .join(ok_idx, ["band_id", "band_val"], "semi")
            .select("doc_id")
            .distinct()
            .withColumn("_c", F.lit(1))
        )
        (
            part.select("doc_id", "lang")
            .join(exact, "doc_id", "left")
            .join(cand, "doc_id", "left")
            .groupBy("lang")
            .agg(
                F.count("*").cast("bigint").alias("n_new"),
                F.sum(F.coalesce("_e", F.lit(0)))
                .cast("bigint")
                .alias("n_exact_dup"),
                F.sum(F.coalesce("_c", F.lit(0)))
                .cast("bigint")
                .alias("n_cand_docs"),
                F.coalesce(
                    F.sum(F.when(F.col("_e").isNull(), F.col("doc_id"))),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("clean_id_checksum"),
            )
            # IDEMPOTENT sink (round-13 ADVICE): fragments are keyed
            # by batch_id — a retried/replayed micro-batch OVERWRITES
            # its own partition directory instead of appending a
            # duplicate, so the read-time rollup is exactly-once even
            # under foreachBatch's at-least-once replay contract.
            .write.mode("overwrite")
            .parquet(f"{out}/data/batch_id={int(batch_id)}")
        )

    stream = (
        spark.readStream.schema(TABLES["documents"])
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sf_dir}/documents.parque*")
        .filter(F.col("doc_id") >= t_split)
    )
    q = (
        stream.writeStream.foreachBatch(probe_batch)
        .option("checkpointLocation", ckpt_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.read.parquet(f"{out}/data")
        .groupBy("lang")
        .agg(
            F.sum("n_new").cast("bigint").alias("n_new"),
            F.sum("n_exact_dup").cast("bigint").alias("n_exact_dup"),
            F.sum("n_cand_docs").cast("bigint").alias("n_cand_docs"),
            F.sum("clean_id_checksum").cast("bigint").alias(
                "clean_id_checksum"
            ),
        )
        .orderBy("lang")
    )


def streaming_ann_vector_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Vector INGEST as the batch streams in, quantizing against the
    PERSISTED ANN index — the similarity-search twin of
    ``streaming_incremental_dedup_report``: the IVF-SQ8pc index (uint8
    codes + per-list ranges, bucketed on cl) is built once batch-side
    (``_build_persisted_ann_index`` — the static relation a recurring
    ingest probes), and arriving vectors flow through foreachBatch,
    where each micro-batch assigns inverted lists with the CURRENT
    index geometry, quantizes against the CURRENT per-list ranges
    (LEFT join — a vector landing in a list the index never saw gets
    all-zero codes and counts as out-of-band), and writes TWO
    batch_id-keyed artifacts: the delta-CODES segment fragment (the
    ingest artifact ``ann_sq8pc_segmented_probe`` reads between folds;
    a background fold compacts fragments into the next bucketed index
    version) and a |labels|-bounded report fragment.  Both sinks are
    overwrite-per-batch-directory, so a replayed micro-batch replaces
    its own fragments — idempotent under foreachBatch's at-least-once
    contract (the round-13 ADVICE discipline).  Per-vector codes
    depend only on (vector, static index), so the summed report is
    micro-batch-partitioning-independent and equals the one-shot
    batch computation bit-for-bit — the oracle hash-checks that.
    The n_oob column is the live drift signal that feeds the fold
    decision (``ann_index_segment_lifecycle``'s n_oob_segment is its
    batch twin)."""
    import tempfile

    from pyspark.sql import functions as F

    from ..plans.queries_llm import (
        _IVF_MAX_BITS,
        _RP_DIM,
        _ann_parent_stats,
        _build_persisted_ann_index,
        _rp_cluster_spark,
        _sq8_code_from_ranges,
    )
    from ..sources.catalog import TABLES, load_table

    emb = load_table(spark, sf_dir, "embeddings")
    t_split = emb.agg(
        F.floor(0.8 * (F.max("vec_id") + 1)).cast("bigint")
    ).first()[0]
    _tc, t_stats, bits, _nb = _build_persisted_ann_index(
        spark,
        emb.filter(F.col("vec_id") < t_split).select("vec_id", "embedding"),
        "stream_ann",
    )
    # ranges per PARENT list (round 15: the stats table is child-keyed;
    # split parents appear on both children with identical ranges, so
    # joining the full table on cl would duplicate their vectors)
    pstats = _ann_parent_stats(spark, t_stats)
    ext = min(bits + 1, _IVF_MAX_BITS)

    out = tempfile.mkdtemp(prefix="stream_ann_sink_")
    ckpt_dir = tempfile.mkdtemp(prefix="stream_ann_ckpt_")
    oob = F.expr(
        "CASE WHEN mns IS NULL THEN 1 ELSE cast(exists("
        f"sequence(1, {_RP_DIM}), d -> "
        "cast(element_at(embedding, d) as double) < element_at(mns, d) OR "
        "cast(element_at(embedding, d) as double) > element_at(mxs, d)"
        ") as int) END"
    )

    def ingest_batch(bdf: DataFrame, batch_id: int) -> None:
        coded = (
            bdf.select(
                "vec_id",
                "label",
                "embedding",
                _rp_cluster_spark(ext).alias("cle"),
            )
            .select(
                "vec_id",
                "label",
                "embedding",
                (F.col("cle") % F.lit(1 << bits)).alias("cl"),
                F.expr(f"div(cle, {1 << bits})").alias("sub"),
            )
            .join(pstats, "cl", "left")
            .select(
                "vec_id",
                "label",
                F.when(
                    F.coalesce(F.col("is_split"), F.lit(False))
                    & (F.col("sub") == 1),
                    F.col("cl") + F.lit(1 << bits),
                )
                .otherwise(F.col("cl"))
                .alias("ckl"),
                _sq8_code_from_ranges().alias("codes"),
                oob.alias("oob"),
            )
        )
        # (a) the delta-codes segment fragment — batch_id-keyed
        # overwrite, so replays are idempotent; the background fold
        # compacts fragments into the next bucketed index version
        # (fragments carry the index's CHILD list key, so the fold and
        # the segmented probe see the same geometry as the index)
        (
            coded.select("vec_id", "ckl", "codes")
            .write.mode("overwrite")
            .parquet(f"{out}/segments/batch_id={int(batch_id)}")
        )
        # (b) the bounded report fragment (same idempotent keying)
        (
            coded.groupBy("label")
            .agg(
                F.count("*").cast("bigint").alias("n_ingested"),
                F.sum("oob").cast("bigint").alias("n_oob"),
                F.sum(
                    F.expr("aggregate(codes, 0, (a, x) -> a + x)")
                    % F.lit(1000000007)
                )
                .cast("bigint")
                .alias("code_checksum"),
            )
            .write.mode("overwrite")
            .parquet(f"{out}/report/batch_id={int(batch_id)}")
        )

    stream = (
        spark.readStream.schema(TABLES["embeddings"])
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sf_dir}/embeddings.parque*")
        .filter(F.col("vec_id") >= t_split)
    )
    q = (
        stream.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", ckpt_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.read.parquet(f"{out}/report")
        .groupBy("label")
        .agg(
            F.sum("n_ingested").cast("bigint").alias("n_ingested"),
            F.sum("n_oob").cast("bigint").alias("n_oob"),
            F.sum("code_checksum").cast("bigint").alias("code_checksum"),
        )
        .orderBy("label")
    )
