"""Source/sink format coverage beyond parquet (SURVEY.md §2.1 [GAP]
row: engine supports parquet/csv/json via DataFrameReader with
declared schemas — never inferSchema).

Each round-trip query WRITES a derived dataset in the target format
and reads it back with the declared schema before aggregating; the
oracle aggregates the original parquet directly, so the check proves
the format encode/decode is lossless for the covered types
(timestamps included).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

IO_ROOT = "/tmp/spark_graft_io"


def _io_dir(sf_dir: str, name: str) -> str:
    return os.path.join(IO_ROOT, os.path.basename(sf_dir.rstrip("/")), name)


@register(
    "csv_roundtrip_orders",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
    doc="CSV sink + schema-declared CSV scan round-trip: open orders "
    "written as CSV, read back (explicit schema, header), aggregated. "
    "Oracle reads the original parquet — losslessness is the check.",
    tags=("sources", "csv"),
)
def csv_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    path = _io_dir(sf_dir, "orders_csv")
    orders.write.mode("overwrite").option("header", "true").csv(path)
    back = spark.read.option("header", "true").schema(orders.schema).csv(path)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@register(
    "json_roundtrip_events",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 4) AS total_value,
           CAST(min(epoch_us(ts)) AS BIGINT) AS first_us
    FROM events
    GROUP BY event_type
    """,
    doc="JSON-lines sink + schema-declared JSON scan round-trip over "
    "events (timestamps survive microsecond-exact).",
    tags=("sources", "json"),
)
def json_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    path = _io_dir(sf_dir, "events_json")
    # default JSON timestampFormat truncates to milliseconds — pin a
    # microsecond format so the round-trip is lossless
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ev.write.mode("overwrite").option("timestampFormat", ts_fmt).json(path)
    back = spark.read.schema(ev.schema).option("timestampFormat", ts_fmt).json(path)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.min(F.unix_micros("ts")).alias("first_us"),
    )


@register(
    "orc_roundtrip_customer",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n,
           round(sum(c_acctbal), 2) AS balance
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="ORC sink + scan round-trip (the other columnar format Spark "
    "ships natively — same predicate-pushdown/column-pruning "
    "machinery as parquet): customer written as ORC, read back, "
    "aggregated; oracle reads the original parquet.",
    tags=("sources", "orc"),
)
def orc_roundtrip_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    path = _io_dir(sf_dir, "customer_orc")
    cust.write.mode("overwrite").orc(path)
    back = spark.read.schema(cust.schema).orc(path)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 2).alias("balance")
    )


@register(
    "parquet_sorted_layout",
    oracle="""
    SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
    """,
    doc="Data-skipping-friendly layout: lineitem rewritten with "
    "repartitionByRange + sortWithinPartitions on l_shipdate, then "
    "re-scanned with a shipdate predicate. Range-clustering makes "
    "parquet row-group min/max statistics selective, so at 100 TB the "
    "pushed filter skips whole files/row groups instead of scanning "
    "them — the write-side half of predicate pushdown.",
    tags=("sources", "parquet", "layout"),
)
def parquet_sorted_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    path = _io_dir(sf_dir, "lineitem_sorted")
    (
        li.repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(
        F.col("l_shipdate") >= F.lit("1998-06-01").cast("timestamp")
    )
    return back.agg(
        F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("revenue")
    )


@register(
    "reference_text_ingestion",
    oracle=None,  # float32 text round-trip noise makes value oracles
    # fragile; exact value/shape checks live in tests/test_reference_format.py
    doc="The reference's native input contract (missing data_loader, "
    "run.py:3,44-55): whitespace text lines of steps x features + "
    "label, ingested distributed (text scan -> split -> slice-reshape "
    "to the long format) — no driver-side numpy. This query writes a "
    "small fixture-derived dataset in that format and loads it back.",
    tags=("sources", "text", "reference"),
)
def reference_text_ingestion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.reference_format import load_data

    steps, feats = 4, 1
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    w_cols = ["user_id"]
    from pyspark.sql import Window as W

    w = W.partitionBy(*w_cols).orderBy("ts", "event_id")
    seq = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= steps)
        .groupBy("user_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("rn", "value"))).alias("sv"),
            F.count("*").alias("n"),
            F.avg("value").alias("avg_v"),
        )
        .filter(F.col("n") == steps)
    )
    lines = seq.select(
        F.concat_ws(
            " ",
            F.concat_ws(" ", F.transform("sv", lambda x: F.format_string("%.6f", x["value"]))),
            (F.col("avg_v") > 50).cast("int").cast("string"),
        ).alias("value")
    )
    path = _io_dir(sf_dir, "reference_txt")
    lines.coalesce(1).write.mode("overwrite").text(path)
    long_df = load_data(spark, feats, steps, path, "*.txt", task="click")
    return long_df.groupBy("task", "step").agg(
        F.count("*").alias("n_entities"),
        F.round(F.sum(F.element_at("features", 1).cast("double")), 1).alias("step_sum"),
        F.sum("label").alias("n_pos"),
    )


@register(
    "parquet_partitioned_sink",
    oracle="""
    SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 4) AS qty
    FROM lineitem
    WHERE l_linenumber <= 2
    GROUP BY l_returnflag
    """,
    doc="Partitioned parquet sink (partitionBy returnflag — the "
    "B-matrix round-partitioned dump pattern, model.py:296-310) + "
    "partition-pruning-capable re-scan.",
    tags=("sources", "parquet"),
)
def parquet_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    path = _io_dir(sf_dir, "lineitem_part")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("qty")
    )


@register(
    "xml_roundtrip_nation",
    oracle="""
    SELECT r_regionkey AS n_regionkey, count(*) AS n,
           min(n_name) AS first_nation
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1
    """,
    doc="XML sink + rowTag scan round-trip (Spark 4 ships the XML "
    "connector natively): nation written as XML records, read back "
    "with a declared schema, joined to region and aggregated; the "
    "oracle aggregates the original parquet — XML encode/decode "
    "losslessness is the check.",
    tags=("sources", "xml"),
)
def xml_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    path = _io_dir(sf_dir, "nation_xml")
    nation.write.mode("overwrite").format("xml").option("rowTag", "nation").save(path)
    back = spark.read.format("xml").option("rowTag", "nation").schema(nation.schema).load(path)
    return (
        back.join(F.broadcast(region), back.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_regionkey").alias("n_regionkey"))
        .agg(F.count("*").alias("n"), F.min("n_name").alias("first_nation"))
    )


@register(
    "binaryfile_ingest_stats",
    oracle=None,  # binaryFile rows carry filesystem paths/mtimes — no
    # DuckDB-relatable table; content digests pinned in
    # tests/test_reference_format.py-style pytest instead
    doc="The multimodal ingest path: spark.read.format('binaryFile') "
    "over a directory of opaque payload files — each row is (path, "
    "length, content BINARY); emits per-file length + sha2(content) "
    "digests.  This is how image/audio/video corpora enter the engine "
    "before operators/multimodal.py kernels run; scans parallelize "
    "per-file and never materialize payloads on the driver.",
    tags=("sources", "binary", "multimodal"),
)
def binaryfile_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    # materialize a small deterministic payload corpus from documents —
    # executors write their own partitions (no driver materialization;
    # scales with the corpus as long as payload_dir is shared storage,
    # which is what a binaryFile corpus means on a real cluster anyway)
    src = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0)
    payload_dir = _io_dir(sf_dir, "binary_payloads")
    _os.makedirs(payload_dir, exist_ok=True)

    def _write_payloads(rows, _dir=payload_dir):
        import os

        for r in rows:
            with open(os.path.join(_dir, f"doc_{r['doc_id']}.bin"), "wb") as f:
                f.write(r["text"].encode("utf-8"))

    src.select("doc_id", "text").foreachPartition(_write_payloads)
    files = spark.read.format("binaryFile").load(payload_dir)
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    return files.select(
        name.alias("file_name"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.sha2("content", 256).alias("digest"),
    )


@register(
    "compaction_roundtrip_events",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY event_type
    """,
    doc="Small-file compaction round-trip (table maintenance, "
    "SURVEY §2.1 sinks): events are deliberately fragmented into 64 "
    "tiny part files (a streaming-sink pathology), compacted to "
    "~4 MB targets via operators/compaction.py (metadata-only size "
    "planning through the Hadoop FS API + one distributed rewrite "
    "pass), and the compacted copy is aggregated.  The oracle "
    "aggregates the ORIGINAL parquet — content losslessness is the "
    "check here; the file-count collapse itself is pinned in "
    "tests/test_operators.py.",
    tags=("sources", "maintenance"),
)
def compaction_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.compaction import compact_parquet

    ev = load_table(spark, sf_dir, "events")
    frag = _io_dir(sf_dir, "events_fragmented")
    compacted = _io_dir(sf_dir, "events_compacted")
    # manufacture the pathology: 64 small files
    ev.repartition(64).write.mode("overwrite").parquet(frag)
    compact_parquet(spark, frag, compacted, target_bytes=4 * 1024 * 1024)
    back = spark.read.parquet(compacted)
    # events were written as µs timestamps by load_table's read, so
    # the compacted copy reads back as plain TIMESTAMP — no nanos
    # handling needed on the second hop
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value")
    )


@register(
    "parquet_schema_evolution",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Parquet schema evolution: generation 1 is written WITHOUT "
    "the is_big flag column, generation 2 adds it; the mergeSchema "
    "read unions both generations, old rows surface NULL for the new "
    "column, and the aggregate coalesces NULL→recomputed flag.  The "
    "oracle recomputes from the source table — the check proves no "
    "rows or values are lost across the schema change.  At 100 TB "
    "mergeSchema's footer sampling is the cheap path (schemas differ "
    "in ONE column); a full evolution story would pin the merged "
    "schema explicitly in the table catalog.",
    tags=("sources", "maintenance"),
)
def parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    path = _io_dir(sf_dir, "orders_evolving")
    gen1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    gen2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        (F.col("o_totalprice") > 200000).alias("is_big"),
    )
    gen1.write.mode("overwrite").parquet(path)
    gen2.write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", "true").parquet(path)
    flagged = F.coalesce(F.col("is_big"), F.col("o_totalprice") > 200000)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(flagged.cast("int")).cast("bigint").alias("n_flagged"),
        )
        .orderBy("o_orderstatus")
    )


def _zorder_oracle() -> str:
    from ..operators.layout import zorder_sql

    z = zorder_sql("user_id % 32768", "CAST(ts AS DATE) - DATE '1995-01-01'")
    return f"""
    SELECT CAST(floor({z} / 1048576) AS BIGINT) AS z_tile,
           count(*) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY z_tile
    ORDER BY z_tile
    """


@register(
    "zorder_tile_stats",
    oracle=_zorder_oracle(),
    doc="Z-order (Morton) clustering key over (user_id, day): the "
    "multi-dimensional layout key Delta/Iceberg OPTIMIZE ZORDER "
    "uses, built from portable bit-interleave arithmetic "
    "(operators/layout.py — the SAME bit loop emits the Spark "
    "column and the DuckDB oracle expression).  Rows are tiled by "
    "the top Morton bits; each tile is a compact 2-D block, so "
    "range-partitioned files carry tight min/max on BOTH columns — "
    "the pruning effect itself is pinned in tests/test_operators.py "
    "against a 1-D layout.  Map-side arithmetic + one agg shuffle.",
    tags=("sources", "maintenance", "layout"),
)
def zorder_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import zorder_col

    ev = load_table(spark, sf_dir, "events")
    z = zorder_col(
        F.col("user_id") % 32768,
        F.datediff(F.to_date("ts"), F.lit("1995-01-01").cast("date")),
    )
    return (
        ev.select(F.floor(z / F.lit(1048576)).cast("bigint").alias("z_tile"), "user_id")
        .groupBy("z_tile")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("z_tile")
    )


@register(
    "pydatasource_synthetic_series",
    oracle="""
    WITH rows_gen AS (
        SELECT e.e AS entity_id, s.s AS step,
               CAST((e.e * 31 + s.s * 7) % 97 AS DOUBLE) / 97.0 AS value
        FROM (SELECT unnest(range(0, 40)) AS e) e
        CROSS JOIN (SELECT unnest(range(0, 11)) AS s) s
    )
    SELECT entity_id,
           CAST(count(*) AS BIGINT) AS n_steps,
           round(sum(value), 6) AS total,
           round(avg(value), 6) AS mean_v
    FROM rows_gen
    GROUP BY entity_id
    ORDER BY entity_id
    """,
    doc="Spark 4 Python DataSource API end-to-end: a custom batch "
    "source (sources/pydatasource.py) registered on the session and "
    "read with spark.read.format('synthetic_series') — "
    "partitions() fans out 4 independent InputPartitions whose "
    "read() generators run executor-side, the extension shape any "
    "Spark-lacking format (REST pages, queue shards, proprietary "
    "splits) plugs into; the reference's missing data_loader "
    "(run.py:3) is exactly such a connector.  The source's "
    "deterministic arithmetic lets DuckDB regenerate every row from "
    "range(), so the full ingest→aggregate path is hash-checked.",
    tags=("sources", "spark4"),
)
def pydatasource_synthetic_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.pydatasource import make_synthetic_series_datasource

    spark.dataSource.register(make_synthetic_series_datasource())
    df = (
        spark.read.format("synthetic_series")
        .option("partitions", "4")
        .option("entities", "40")
        .option("steps", "11")
        .load()
    )
    return (
        df.groupBy("entity_id")
        .agg(
            F.count("*").cast("bigint").alias("n_steps"),
            F.round(F.sum("value"), 6).alias("total"),
            F.round(F.avg("value"), 6).alias("mean_v"),
        )
        .orderBy("entity_id")
    )


@register(
    "dpp_partitioned_probe",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem
    WHERE l_returnflag IN ('A', 'N') AND l_linenumber <= 2
    GROUP BY 1 ORDER BY 1
    """,
    doc="Dynamic partition pruning probe: the fact is laid out "
    "partitionBy(l_returnflag), then probed through a JOIN against a "
    "filtered dimension of flags — the optimizer must push a runtime "
    "subquery filter into the fact scan so unselected partitions are "
    "never read (plan-gated: `dynamicpruning` in the scan).  This is "
    "THE mechanism that makes star-schema joins over partitioned "
    "100 TB facts read only the joined slice; static predicate "
    "pushdown cannot do it because the qualifying keys only exist at "
    "run time on the dim side.",
    tags=("sources", "parquet", "join"),
)
def dpp_partitioned_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    path = _io_dir(sf_dir, "lineitem_dpp")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    fact = spark.read.parquet(path)
    flags = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_returnflag").alias("flag"))
        .distinct()
        .filter(F.col("flag").isin("A", "N"))
    )
    return (
        fact.join(F.broadcast(flags), fact.l_returnflag == flags.flag)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )
