"""Sources/sinks family (SURVEY.md §2B "Scans/sources" + "Sinks").

Each entry exercises a real scan or sink path end-to-end against fixture
data, hermetically (no network, no external DB):

- ``scan_parquet``      — full-schema columnar scan (ref op #3).
- ``scan_csv_schema``   — CSV with an explicit schema, round-tripped
  through a Spark CSV write (never ``inferSchema``: inference is a full
  extra pass over 100 TB).
- ``source_http``       — the reference's HTTP fetch (ref op #1,
  ``bronze:40-94``) via stdlib urllib over a ``file://`` URL: same
  driver-spool-then-distributed-scan shape, deterministic in CI.
- ``sink_partitioned_prune`` — partitioned layer write + pruned
  read-back (ref op #15 upgraded with ``partitionBy``): the filter on
  the partition column prunes directories, not rows.

- ``scan_excel``         — the reference's core ingest (ref op #4,
  ``bronze:154``): a real xlsx round-trip through the hermetic stdlib
  reader/writer in ``sources/xlsx.py`` (no openpyxl in this env).
- ``scan_jdbc_roundtrip`` — batched JDBC sink -> partitioned JDBC scan
  against embedded Derby (the JDBC driver Spark ships for its Hive
  metastore), replacing the reference's per-row Postgres INSERTs
  (ref ops #7/#17, ``bronze:161-179``).
"""

from __future__ import annotations

import os

from projetos_etl_spark.scratch import scratch_dir, scratch_path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from projetos_etl_spark.functions.finite import finite, sql_finite
from projetos_etl_spark.medallion import source_http
from projetos_etl_spark.registry._core import Registry
from projetos_etl_spark.sources.io import load_table, scan_csv, sink_partitioned

REG = Registry()


@REG.add(
    "scan_parquet",
    oracle="SELECT p_partkey, p_name, p_brand, p_type, p_size, round(p_retailprice, 2) AS p_retailprice FROM part",
)
def scan_parquet_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain columnar scan, full declared schema. At scale: splittable
    row groups, column pruning and predicate pushdown all come free from
    the parquet source (SURVEY.md §4.2)."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_brand",
        "p_type",
        "p_size",
        F.round("p_retailprice", 2).alias("p_retailprice"),
    )


CUSTOMER_CSV_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_mktsegment", T.StringType()),
        T.StructField("c_acctbal", T.DoubleType()),
    ]
)


@REG.add(
    "scan_csv_schema",
    oracle="SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer",
)
def scan_csv_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with explicit schema (ref ingests xlsx; CSV is the
    splittable text-format equivalent). Round-trips customer through a
    quoted CSV write, then scans it back with the declared StructType —
    doubles survive because Spark writes shortest-round-trip literals."""
    out = scratch_dir("csv_")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    cust.write.mode("overwrite").option("header", True).csv(out)
    return scan_csv(spark, out, CUSTOMER_CSV_SCHEMA)


@REG.add("source_http", oracle="SELECT * FROM region")
def source_http_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP source (ref op #1): urllib GET -> driver spool -> distributed
    scan. Uses a file:// URL for hermetic CI; the code path is identical
    for http(s)://. Only the bounded fetch is driver-side — never on the
    100 TB path (SURVEY.md §7 'Hard parts')."""
    spool = os.path.join(scratch_dir("http_"), "region.parquet")
    return source_http(spark, f"file://{sf_dir}/region.parquet", spool)


@REG.add(
    "source_http_datasource",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def source_http_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reusable ``httpfile`` Python Data Source (``sources/httpds.py``,
    SURVEY.md §2A op #1's scale-path variant): each partition's URL is
    fetched ON AN EXECUTOR — a manifest of N shard URLs scans N-wide with
    the driver never touching bytes. Here the nation table round-trips
    through two CSV shards served as file:// URLs (hermetic http stand-in)."""
    import glob

    from projetos_etl_spark.session import ship_package
    from projetos_etl_spark.sources.httpds import HttpFileDataSource

    ship_package(spark)
    spark.dataSource.register(HttpFileDataSource)

    out = scratch_dir("httpds_")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    nation.repartition(2).write.mode("overwrite").option("header", True).csv(out)
    urls = ",".join(f"file://{p}" for p in sorted(glob.glob(f"{out}/part-*.csv")))
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.LongType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.LongType()),
        ]
    )
    return (
        spark.read.format("httpfile").schema(schema).option("url", urls).load()
    )


@REG.add(
    "scan_excel",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_excel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excel ingest (ref op #4, ``bronze:154``) actually executing: the
    nation table is rendered to a real .xlsx (stdlib writer), then parsed
    back through ``medallion.bronze_ingest_excel`` -> the stdlib reader
    (``sources/xlsx.py``). Headers carry stray whitespace so the conform
    step's header strip (ref op #5, ``silver:71``) is exercised too.
    Driver-side by design: one workbook is a bounded, non-splittable
    input (the collect is 25 rows)."""
    from projetos_etl_spark.medallion import bronze_ingest_excel
    from projetos_etl_spark.sources.xlsx import write_xlsx

    rows = load_table(spark, sf_dir, "nation").orderBy("n_nationkey").collect()
    # mkdtemp + fixed name (not the race-prone, deprecated mktemp): the
    # directory is created atomically and owned by this process.
    path = os.path.join(scratch_dir("xlsx_"), "nation.xlsx")
    write_xlsx(
        path,
        [" n_nationkey", "n_name ", "n_regionkey"],
        [[r.n_nationkey, r.n_name, r.n_regionkey] for r in rows],
    )
    df = bronze_ingest_excel(spark, path)
    return df.select(
        F.col("n_nationkey").cast("long"),
        "n_name",
        F.col("n_regionkey").cast("long"),
    )


@REG.add(
    "scan_jdbc_roundtrip",
    oracle="SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 2) AS s_acctbal FROM supplier",
)
def scan_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC warehouse round-trip (ref ops #7/#17, ``bronze:161-179``)
    against embedded Derby — the JDBC engine Spark itself ships (it backs
    the Hive metastore), so this runs hermetically. Write path is the
    batched, partition-parallel ``sink_jdbc_batch`` (vs the reference's
    one INSERT per row = O(n) network round trips); read path is
    ``scan_jdbc`` with a numeric ``partitionColumn``, planning 4
    range-bounded queries that fetch in parallel. Derby narrows INT
    columns, so the scan casts back to the warehouse's declared widths.
    """
    from projetos_etl_spark.sources.io import scan_jdbc, sink_jdbc_batch

    db = scratch_dir("derby_") + "/db"
    url = f"jdbc:derby:{db};create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", F.round("s_acctbal", 2).alias("s_acctbal")
    )
    sink_jdbc_batch(sup, url, "supplier_wh", mode="overwrite", properties=props)
    hi = sup.agg(F.max("s_suppkey")).collect()[0][0]  # 1-row bound lookup
    # max() over an EMPTY warehouse table is NULL: bounds of [0, 1) plan
    # 4 range queries that each fetch nothing — the scan stays total
    # instead of crashing on int(None).
    back = scan_jdbc(
        spark,
        url,
        "supplier_wh",
        partition_column="s_suppkey",
        num_partitions=4,
        lower_bound=0,
        upper_bound=1 if hi is None else int(hi) + 1,
        properties=props,
    )
    return back.select(
        "s_suppkey",
        "s_name",
        F.col("s_nationkey").cast("long").alias("s_nationkey"),
        "s_acctbal",
    )


@REG.add(
    "sink_partitioned_prune",
    oracle="""
    SELECT o_orderpriority,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 0) AS total_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sink_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned layer write + pruned read-back: orders written
    ``partitionBy(o_orderstatus)``, then scanned with a filter on the
    partition column — Spark prunes to the one matching directory
    (PartitionFilters in the plan), so the 100 TB version reads only the
    'F' slice. This is the layer-write discipline sources/io.py
    prescribes for every silver/gold output."""
    out = scratch_dir("part_")
    orders = load_table(spark, sf_dir, "orders")
    sink_partitioned(orders, out, ["o_orderstatus"])
    # Pin the layer schema on read-back (the production-reader
    # discipline): an EMPTY increment writes no data files, and a
    # schema-less read of the bare directory would fail with
    # UNABLE_TO_INFER_SCHEMA instead of returning the empty slice.
    return (
        spark.read.schema(orders.schema).parquet(out)
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 0).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


EVENTS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


@REG.add(
    "scan_json_lines",
    oracle="SELECT event_id, user_id, event_type, round(value, 6) AS value, props FROM events",
)
def scan_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines scan with explicit schema: events round-trip through a
    Spark JSON write then scan back with the declared StructType. JSON
    lines are splittable (one record per line) so the scan parallelizes
    like CSV; schema is always declared — ``inferSchema`` on 100 TB of
    JSON is a full extra pass. Doubles survive because Spark writes
    shortest-round-trip literals; the nested ``props`` payload stays an
    opaque string here (``fn_json_extract`` covers extraction)."""
    out = scratch_dir("json_")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    ev.write.mode("overwrite").json(out)
    return (
        spark.read.schema(EVENTS_JSON_SCHEMA)
        .json(out)
        .withColumn("value", F.round("value", 6))
    )


@REG.add(
    "scan_orc_roundtrip",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 2) AS s_acctbal
    FROM supplier
    """,
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan (the other columnar format Spark ships natively):
    supplier written as ORC, scanned back. Same pushdown/pruning story
    as parquet (ORC has its own stripe statistics); exists so a
    reference user on an ORC warehouse can switch without a format
    migration."""
    out = scratch_dir("orc_")
    supp = load_table(spark, sf_dir, "supplier")
    supp.write.mode("overwrite").orc(out)
    return spark.read.orc(out).select(
        "s_suppkey", "s_name", "s_nationkey", F.round("s_acctbal", 2).alias("s_acctbal")
    )


@REG.add(
    "catalog_ddl_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def catalog_ddl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog DDL surface (ref ops #6/#16, ``bronze:99-130`` /
    ``silver:161-193``): CREATE TABLE AS SELECT into the session
    catalog (managed parquet table in the warehouse dir), then read back
    via ``spark.table``. The reference issues CREATE TABLE IF NOT EXISTS
    against Postgres; on Spark the same statement targets the catalog,
    and a JDBC catalog would swap in transparently. The table is
    EXTERNAL at a fresh per-run location: a managed CTAS leaves its
    warehouse directory behind when the session (and its in-memory
    catalog) dies, so a later fresh session hits
    LOCATION_ALREADY_EXISTS — DROP IF EXISTS can't see the orphan."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("pes_nation_src")
    loc = scratch_dir("ctas_") + "/tbl"
    spark.sql("DROP TABLE IF EXISTS pes_nation_ctas")
    spark.sql(
        f"""
        CREATE TABLE pes_nation_ctas USING parquet LOCATION '{loc}' AS
        SELECT n_nationkey, n_name, n_regionkey FROM pes_nation_src
        """
    )
    return spark.table("pes_nation_ctas")


#: Malformed lines injected into the CSV scan fixture (token-count and
#: type-parse failures — the two CSV corruption modes).
BAD_CSV_LINES = ["only,two", "notanumber,77,3.5"]


@REG.add(
    "scan_csv_badrecords",
    # The checksum rides the finite gate (functions/finite.py, r12
    # sf_extremes at sf0.01 density): corrupt ±1e300 readings survive
    # the CSV text round-trip losslessly and then make the good-row
    # sum an accumulation-order function (partial order decides whether
    # they cancel). Counts still cover every row — containment is the
    # contract; the checksum is over the usable readings.
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT)      AS n_good,
           CAST({len(BAD_CSV_LINES)} AS BIGINT) AS n_corrupt,
           round(sum({sql_finite("value")}), 2) AS good_value_sum
    FROM events
    """,
)
def scan_csv_badrecords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE malformed-record handling: events round-trip through
    CSV, two corrupt lines are injected (wrong column count; failed
    numeric parse), and the scan declares a ``_corrupt_record`` column —
    bad rows land there with nulls elsewhere instead of killing the job
    or (FAILFAST) the stage. The entry returns good/corrupt counts and
    the good-row checksum, proving corruption is contained row-wise.
    At 100 TB, quarantining ``_corrupt_record IS NOT NULL`` to a
    dead-letter sink is the standard pattern; DROPMALFORMED silently
    loses data and FAILFAST loses the job."""
    out = scratch_dir("badcsv_")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ev.write.mode("overwrite").option("header", False).csv(out)
    with open(f"{out}/zz-injected-bad.csv", "w") as f:
        f.write("\n".join(BAD_CSV_LINES) + "\n")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    scanned = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(out)
        .cache()  # required: corrupt-record queries must not re-parse with a pruned schema
    )
    return scanned.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("n_good"),
        F.count(F.col("_corrupt_record")).alias("n_corrupt"),
        F.round(
            F.sum(F.when(F.col("_corrupt_record").isNull(), finite("value"))), 2
        ).alias("good_value_sum"),
    )


@REG.add(
    "maintenance_compact_small_files",
    # Physical file counts are pinned cross-engine only in the regime
    # the contract designs for: a table at least as large as the
    # fragment count (64 -> 4, every fragment task non-empty). Below
    # that — including the empty table — the counts are writer/AQE
    # internals (empty-write single schema file, coalesced empty
    # repartition, n+1-ish part counts at 0 < n < 64), which a Spark
    # version bump or AQE conf change can legitimately flip; pinning
    # them in the ORACLE would break parity with the entry's logic
    # unchanged (r8 ADVICE). Both engines report NULL there; the
    # empty-table single-readable-file behavior stays asserted locally
    # in tests/test_empty_inputs.py against THIS Spark version.
    oracle="""
    SELECT CAST(CASE WHEN count(*) >= 64 THEN 64 END AS BIGINT) AS files_before,
           CAST(CASE WHEN count(*) >= 64 THEN 4 END AS BIGINT) AS files_after,
           count(*) AS n_rows
    FROM orders
    """,
)
def maintenance_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance job every parquet
    lake needs: a fragmented write (here deliberately 64 tasks -> 64
    files) is rewritten into few right-sized files, because at 100 TB
    the scan cost of a table is dominated by file COUNT (driver listing,
    footer reads, task scheduling) once files drop below ~100 MB. The
    rewrite is one distributed ``repartition(4)`` pass — in production
    the target count is ``ceil(table_bytes / 128MB)`` and the repartition
    keys match the downstream join/filter column so compaction doubles
    as clustering (or use ``maxRecordsPerFile`` to cap without an
    exchange). File counts land in the result so the oracle verifies
    the compaction actually happened (64 -> 4), and row counts prove
    the rewrite lost nothing."""
    frag_dir = os.path.join(scratch_dir("compact_"), "frag")
    compact_dir = os.path.join(os.path.dirname(frag_dir), "compact")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(64).write.mode("overwrite").parquet(frag_dir)

    def n_part_files(d: str) -> int:
        return len([f for f in os.listdir(d) if f.startswith("part-")])

    frag = spark.read.parquet(frag_dir)
    frag.repartition(4).write.mode("overwrite").parquet(compact_dir)
    files_before, files_after = n_part_files(frag_dir), n_part_files(compact_dir)
    # File counts are contractual only at n >= 64 (every fragment task
    # non-empty); below that — empty table included — the count is a
    # writer/AQE internal -> NULL (see the oracle comment; the empty
    # single-file behavior is a local pytest assertion instead).
    pinned = F.count(F.lit(1)) >= 64
    return spark.read.parquet(compact_dir).agg(
        F.when(pinned, F.lit(files_before)).cast("long").alias("files_before"),
        F.when(pinned, F.lit(files_after)).cast("long").alias("files_after"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@REG.add(
    "scan_xml",
    oracle="""
    SELECT n_nationkey AS nation_key,
           n_name      AS nation_name,
           n_regionkey AS region_key
    FROM nation
    ORDER BY nation_key
    """,
)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingest via Spark 4's built-in ``format("xml")`` data source
    (the spark-xml library folded into core — SPARK-44265): fixture XML
    is written driver-side from the bounded nation table, then scanned
    back DISTRIBUTED with an explicit schema and ``rowTag`` (schema
    inference on XML costs an extra pass — declare it, same rule as
    ``scan_csv_schema``). At 100 TB the reader splits across files
    (one task per file for un-splittable row-tag framing), so feed-shaped
    XML drops (one file per feed per hour) parallelize by file count;
    pair with ``maintenance_compact_small_files`` downstream."""
    rows = load_table(spark, sf_dir, "nation").orderBy("n_nationkey").collect()
    d = scratch_dir("xml_")
    with open(os.path.join(d, "nations.xml"), "w", encoding="utf-8") as f:
        f.write("<nations>\n")
        for r in rows:
            f.write(
                f"  <nation><key>{r.n_nationkey}</key>"
                f"<name>{r.n_name}</name>"
                f"<region>{r.n_regionkey}</region></nation>\n"
            )
        f.write("</nations>\n")
    schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("region", T.LongType()),
        ]
    )
    return (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema(schema)
        .load(d)
        .select(
            F.col("key").alias("nation_key"),
            F.col("name").alias("nation_name"),
            F.col("region").alias("region_key"),
        )
        .orderBy("nation_key")
    )


@REG.add(
    "scan_parquet_merge_schema",
    oracle="""
    SELECT n_nationkey, n_name,
           CAST(NULL AS VARCHAR) AS region_name
    FROM nation WHERE n_regionkey = 0
    UNION ALL
    SELECT n.n_nationkey, n.n_name, r.r_name AS region_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE n.n_regionkey <> 0
    """,
)
def scan_parquet_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on scan: two parquet batches written with
    DIFFERENT schemas (an early batch before a ``region_name`` column
    existed, a later batch with it) read back as ONE table via
    ``mergeSchema`` — the added column is NULL-filled for old files.
    This is the append-only schema-evolution contract every long-lived
    lake table needs (new columns appear mid-stream; historical files
    are never rewritten). ``mergeSchema`` is opt-in per scan because
    footer-merging all files costs a distributed pass at 100 TB — the
    production posture is a table format or a catalog-pinned schema,
    with this flag for ad-hoc reads; the cost and the default-off are
    the point, not an accident."""
    out = scratch_dir("evo_")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    nat.filter(F.col("n_regionkey") == 0).select("n_nationkey", "n_name").write.mode(
        "overwrite"
    ).parquet(out + "/batch=old")
    nat.filter(F.col("n_regionkey") != 0).join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    ).select(
        "n_nationkey", "n_name", F.col("r_name").alias("region_name")
    ).write.mode("overwrite").parquet(out + "/batch=new")
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(out)
        .select("n_nationkey", "n_name", "region_name")
    )


@REG.add(
    "sink_csv_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name,
           concat(n_name, ', says "', n_name, '"', chr(10), 'line2') AS tricky
    FROM nation ORDER BY n_nationkey
    """,
)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + scan under RFC-4180 hostile content: fields carrying
    embedded delimiters, double quotes, AND newlines are written with
    quote-doubling (``escape='"'``) and read back with ``multiLine`` —
    byte-identical (the oracle recomputes the derived strings directly;
    equality proves the round-trip lost nothing). This is the format-
    fidelity gate for the interchange format everything downstream of a
    warehouse still speaks. Scale note: ``multiLine`` makes each CSV
    file non-splittable (a record can straddle any byte offset), so at
    100 TB hostile-content CSV wants many medium files, not few huge
    ones — or parquet, which is the engine's default interchange."""
    out = scratch_dir("csv_")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey",
        "n_name",
        F.concat(
            F.col("n_name"),
            F.lit(', says "'),
            F.col("n_name"),
            F.lit('"\nline2'),
        ).alias("tricky"),
    )
    n.write.mode("overwrite").option("header", True).option("escape", '"').csv(out)
    return (
        spark.read.schema("n_nationkey INT, n_name STRING, tricky STRING")
        .option("header", True)
        .option("escape", '"')
        .option("multiLine", True)
        .csv(out)
        .orderBy("n_nationkey")
    )


@REG.add(
    "sink_pyds_jsonl",
    oracle="""
    SELECT n_nationkey, upper(n_name) AS name_uc, n_regionkey
    FROM nation ORDER BY n_nationkey
    """,
)
def sink_pyds_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source SINK round-trip (Spark 4 writer API,
    ``sources/jsonlsink.py``): nation-derived rows written by the
    executor-parallel ``jsonldir`` sink — per-task shard files, a real
    two-phase commit (tasks report shards, only the driver's commit
    publishes the _SUCCESS manifest) — then read back with the builtin
    JSON scan and proven byte-faithful against the direct compute. The
    write-side twin of ``source_http_datasource``: together they cover
    both halves of the Data Source extension point a user needs when a
    format Spark doesn't ship has to scale out."""
    import json as _json

    from projetos_etl_spark.sources.jsonlsink import register

    register(spark)
    out = scratch_dir("jsonl_") + "/shards"
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.upper("n_name").alias("name_uc"), "n_regionkey"
    )
    n.write.format("jsonldir").option("path", out).mode("append").save()
    with open(f"{out}/_SUCCESS") as f:
        manifest = _json.load(f)
    assert manifest["rows"] == n.count(), "jsonldir manifest row-count drift"
    return (
        spark.read.schema("n_nationkey INT, name_uc STRING, n_regionkey INT")
        .json(f"{out}/part-*.jsonl")
        .orderBy("n_nationkey")
    )


RETENTION_CUTOFF = "2024-01-15 12:00:00"


@REG.add(
    "maintenance_retention_sweep",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS min_ts
    FROM events
    WHERE ts >= TIMESTAMP '{RETENTION_CUTOFF}'
    GROUP BY 1 ORDER BY day
    """,
)
def maintenance_retention_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention enforcement on a day-partitioned layer, executed the
    way a 100 TB table has to do it: partitions wholly past the cutoff
    are DROPPED as pure directory deletes (zero data read — removing
    14 days of a petabyte layer costs 14 metadata ops), and ONLY the
    single boundary partition (the day the cutoff bisects) is read,
    row-filtered, and rewritten in place. Partitions newer than the
    boundary are never opened (pinned by file-level identity in
    tests/test_sources.py). A WHERE-filter-and-rewrite-everything
    retention job — the naive formulation — rewrites the entire table
    to delete old rows; partition-aligned retention is why layers are
    date-partitioned in the first place. Readback is the standard
    partition-discovering scan; the oracle recomputes the surviving
    rows from the raw table.

    Family-seven convention: a NULL-ts row has no partition home in a
    date-partitioned layer — it would land in the
    __HIVE_DEFAULT_PARTITION__ directory, which a date-compare sweep
    can neither age nor drop, silently exempting exactly the corrupt
    rows from retention forever. Excluded at the layer write (the
    production fix is an upstream quarantine lane); the oracle's
    ``ts >= cutoff`` drops the same rows by three-valued logic."""
    from projetos_etl_spark.sources.io import retention_sweep

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    base = scratch_dir("retention_") + "/layer"
    layer = ev.withColumn(
        "d", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    layer.write.partitionBy("d").parquet(base)
    retention_sweep(spark, base, "ts", RETENTION_CUTOFF)
    # Pin the layer schema on read-back (production-reader discipline):
    # an EMPTY layer has no partition directories to infer from, and a
    # fully-swept layer must read back as zero surviving rows, not as
    # an UNABLE_TO_INFER_SCHEMA failure.
    kept = spark.read.schema(layer.schema).parquet(base)
    return (
        kept.groupBy(F.col("d").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("min_ts"),
        )
        .orderBy("day")
    )


DATE_DIM_START, DATE_DIM_END = "1992-01-01", "1998-12-31"


@REG.add(
    "gen_date_dim",
    oracle=f"""
    SELECT strftime(d, '%Y-%m-%d')                       AS date_key,
           CAST(year(d) AS INTEGER)                      AS year,
           CAST(quarter(d) AS INTEGER)                   AS quarter,
           CAST(month(d) AS INTEGER)                     AS month,
           CAST(isodow(d) AS INTEGER)                    AS iso_dow,
           CAST(isodow(d) IN (6, 7) AS BOOLEAN)          AS is_weekend,
           strftime(date_trunc('month', d), '%Y-%m-%d')  AS month_start
    FROM (
        SELECT unnest(generate_series(DATE '{DATE_DIM_START}',
                                      DATE '{DATE_DIM_END}',
                                      INTERVAL 1 DAY))::DATE AS d
    )
    ORDER BY date_key
    """,
)
def gen_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar dimension — the date spine every warehouse
    joins its facts against (fiscal rollups, weekend/weekday splits,
    gap-free reporting axes). Generated DISTRIBUTED, not on the driver:
    one ``sequence`` literal exploded into rows, derived attributes as
    pure codegen — the idiom that replaces loading a hand-maintained
    calendar CSV. At 100 TB the date dim is broadcast-sized by
    construction (a century is ~36.5k rows), which is exactly why the
    fact-side join to it should always be a BroadcastHashJoin; the
    engine's partition-pruned layers use the same derived day key."""
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(DATE_DIM_START).cast("date"),
                    F.lit(DATE_DIM_END).cast("date"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("d")
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("date_key"),
            F.year("d").cast("int").alias("year"),
            F.quarter("d").cast("int").alias("quarter"),
            F.month("d").cast("int").alias("month"),
            F.dayofweek("d").alias("__dow"),
            F.date_format(F.date_trunc("month", F.col("d")), "yyyy-MM-dd").alias(
                "month_start"
            ),
        )
        .select(
            "date_key",
            "year",
            "quarter",
            "month",
            # Spark dayofweek: 1=Sunday..7=Saturday -> ISO 1=Monday..7=Sunday.
            F.when(F.col("__dow") == 1, 7).otherwise(F.col("__dow") - 1)
            .cast("int")
            .alias("iso_dow"),
            (
                F.when(F.col("__dow") == 1, 7).otherwise(F.col("__dow") - 1) >= 6
            ).alias("is_weekend"),
            "month_start",
        )
        .orderBy("date_key")
    )


@REG.add(
    "obs_inline_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)                            AS n_rows,
           CAST(sum(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_big,
           round(avg(o_totalprice), 2)                         AS avg_price,
           round(max(o_totalprice), 2)                         AS max_price
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
)
def obs_inline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline pipeline observability (``DataFrame.observe`` +
    ``Observation``): data-quality metrics computed as accumulator-style
    side outputs OF THE MAIN JOB — row counts, threshold counts, avg/max
    — with ZERO extra scan. The alternative every naive pipeline ships
    is a second ``df.agg(...)`` pass that re-reads the table; at 100 TB
    that doubles the I/O bill just to fill a metrics dashboard. The
    observed batch here is a filter+project job driven to the noop sink
    (the metrics attach to whatever real sink the pipeline uses); the
    oracle recomputes the same aggregates relationally, proving the
    piggybacked values are exact, not sampled."""
    from pyspark.sql import Observation

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    obs = Observation()
    observed = o.observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum((F.col("o_totalprice") > 300000).cast("int")).cast("long").alias("n_big"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
    # Drive the observed job through a real (noop) sink; obs.get blocks
    # until the action's metrics arrive.
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_big"], m["avg_price"], m["max_price"])],
        "n_rows long, n_big long, avg_price double, max_price double",
    )


@REG.add(
    "sink_dynamic_partition_overwrite",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_urgent
    FROM orders
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the incremental-batch write
    pattern: a rerun replaces ONLY the partitions present in its output
    (here: the 'O' slice rewritten in place) while every other
    partition's files are untouched. Under the default STATIC mode the
    same ``mode("overwrite")`` would have deleted the whole table — the
    classic lost-data footgun this entry pins the guard against. At
    100 TB this is how daily reprocessing commits: the job writes the
    day it computed, the other 3,650 partitions aren't listed, moved,
    or rewritten. Correctness is proven by the read-back: full-table
    aggregate equals the source-table oracle, i.e. the selective
    overwrite changed exactly nothing it shouldn't have.

    Scratch space is a FIXED per-process path reused (and fully
    rewritten, STATIC overwrite) on every invocation rather than a
    fresh mkdtemp: the returned DataFrame lazily reads from it, so a
    finally-rmtree would race the caller's collect, and fresh temp dirs
    accumulated a table copy per sweep (ADVICE r4; ``scratch.py`` now
    also prunes dead sessions' dirs)."""
    out = scratch_path("dynpart_scratch")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # The "rerun": recompute only the open-orders slice and
        # overwrite; with dynamic mode the F/P directories survive.
        orders.filter(F.col("o_orderstatus") == "O").write.mode(
            "overwrite"
        ).partitionBy("o_orderstatus").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # Pin the layer schema on read-back (production-reader discipline):
    # an EMPTY source writes no partition directories, and the rerun of
    # an empty increment must read back as an empty table, not fail
    # schema inference.
    return (
        spark.read.schema(orders.schema).parquet(out)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum((F.col("o_orderpriority") == "1-URGENT").cast("int"))
            .cast("long")
            .alias("n_urgent"),
        )
        .orderBy("o_orderstatus")
    )


@REG.add(
    "scan_csv_multiline_quoted",
    # The fixture text is single-line (pinned by tests), so newline
    # injection + restore is an exact round-trip and the oracle works
    # on the original view.
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           md5(string_agg(md5(text), '' ORDER BY doc_id)) AS corpus_md5
    FROM documents
    """,
)
def scan_csv_multiline_quoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV fields with EMBEDDED NEWLINES — the connector path that
    breaks naive splittable scans: with ``multiLine=true`` Spark parses
    quoted records spanning lines (and gives up input-split parallelism
    for correctness — each file parses whole, which is why multiline
    CSV at 100 TB should arrive as MANY files). Every space in the
    document text is swapped for a newline before the quoted write, so
    every row exercises the path; the restored corpus must digest-match
    the original table exactly."""
    out = scratch_path("mlcsv_scratch")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # The writer/reader option pairing below is what makes the trip
    # EXACT for degenerate strings (r10 sf_hostiletext probe): with the
    # defaults, an empty-string doc reads back as NULL (read nullValue
    # is ''), and the WRITER trims whitespace-only docs to '' before
    # they even land (write ignoreLeading/TrailingWhiteSpace default
    # true) — silent corpus corruption, not even an error. An explicit
    # NULL sentinel distinct from '' plus trim-off preserves all three
    # states: NULL, '', and whitespace-only.
    (
        docs.select("doc_id", F.regexp_replace("text", " ", "\n").alias("text"))
        .write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("nullValue", "\\N")
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(out)
    )
    back = (
        spark.read.schema("doc_id long, text string")
        .option("header", True)
        .option("multiLine", True)
        .option("nullValue", "\\N")
        .csv(out)
        .select("doc_id", F.regexp_replace("text", "\n", " ").alias("text"))
    )
    corpus_md5 = F.md5(
        F.concat_ws(
            "",
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("doc_id"),
                        F.md5(F.col("text").cast("binary")).alias("h"),
                    )
                )
            ).getField("h"),
        ).cast("binary")
    )
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        # A digest of an EMPTY corpus is undefined -> NULL (the engine's
        # degenerate convention), matching SQL string_agg over zero rows
        # — not md5('') which would claim a checksum for no content.
        F.when(F.count(F.lit(1)) > 0, corpus_md5)
        .otherwise(F.lit(None))
        .alias("corpus_md5"),
    )


@REG.add(
    "scan_time_travel",
    # Three commits over the orders table (append low keys, append high
    # keys, overwrite with 'F'-status only), then every version read
    # back by manifest. The oracle recomputes each snapshot straight
    # from the source view — byte-equal because commits are pure
    # selections of it.
    oracle="""
    SELECT 1 AS version,
           CAST(count(*) FILTER (o_orderkey % 2 = 0) AS BIGINT) AS n_rows,
           round(sum(o_totalprice) FILTER (o_orderkey % 2 = 0), 0) AS total
    FROM orders
    UNION ALL
    SELECT 2, CAST(count(*) AS BIGINT), round(sum(o_totalprice), 0) FROM orders
    UNION ALL
    SELECT 3,
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT),
           round(sum(o_totalprice) FILTER (o_orderstatus = 'F'), 0)
    FROM orders
    ORDER BY version
    """,
)
def scan_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version-manifest table log (``operators/tablelog.py``): atomic
    commits + snapshot isolation + time travel on plain parquet — the
    Delta/Iceberg mechanism demonstrated hermetically (no format jars in
    this environment; the real formats are deploy-time swaps). Three
    commits build the history — append, append, OVERWRITE (metadata-
    only: the v3 manifest just stops naming v2's files) — then each
    version is read back BY MANIFEST and aggregated. The reference
    overwrote object-store keys in place (bronze:56-85), which lets
    readers observe torn layers; this is the engine's answer."""
    import shutil

    from projetos_etl_spark.operators.tablelog import commit, read

    table = scratch_path("tablelog_scratch")
    shutil.rmtree(table, ignore_errors=True)  # per-process reuse-and-reset scratch
    orders = load_table(spark, sf_dir, "orders")
    commit(orders.filter(F.col("o_orderkey") % 2 == 0), table, "append")
    commit(orders.filter(F.col("o_orderkey") % 2 == 1), table, "append")
    commit(orders.filter(F.col("o_orderstatus") == "F"), table, "overwrite")
    snaps = []
    for v in (1, 2, 3):
        snaps.append(
            read(spark, table, v).agg(
                F.lit(v).alias("version"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.round(F.sum("o_totalprice"), 0).alias("total"),
            )
        )
    out = snaps[0]
    for s in snaps[1:]:
        out = out.unionByName(s)
    return out.orderBy("version")


@REG.add(
    "table_log_merge_upsert",
    # The deterministic change set: every 'P'-status order gets a +10%
    # price update (seq 1), every key divisible by 10 a delete (seq 2,
    # so the delete wins on overlap), one synthetic insert. The oracle
    # replays the same MERGE relationally per version.
    oracle="""
    WITH changes AS (
        SELECT o_orderkey, CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END
                   AS op
        FROM orders WHERE o_orderstatus = 'P' OR o_orderkey % 10 = 0
    ),
    v2 AS (
        SELECT o.o_orderkey,
               CASE WHEN c.op = 'U' AND o.o_orderstatus = 'P'
                    THEN o.o_totalprice * 1.1 ELSE o.o_totalprice END
                   AS price
        FROM orders o LEFT JOIN changes c ON o.o_orderkey = c.o_orderkey
        WHERE c.op IS NULL OR c.op != 'D'
    )
    SELECT 1 AS version,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows,
           (SELECT round(sum(o_totalprice), 0) FROM orders) AS total
    UNION ALL
    SELECT 2, CAST(count(*) AS BIGINT), round(sum(price), 0) FROM v2
    ORDER BY version
    """,
)
def table_log_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO against the version-manifest table log — CDC under a
    table format, hermetically: v1 commits the base snapshot, a
    deterministic I/U/D change set runs through ``apply_cdc`` (the
    latest-change-wins merge core), and the merged snapshot commits as
    an OVERWRITE (metadata-only publish; v1 stays readable — exactly
    Delta's MERGE + time-travel contract). Both versions are then read
    back BY MANIFEST and aggregated, so the driver verifies pre- and
    post-merge states through the log, not through the writer's memory."""
    import shutil

    from projetos_etl_spark.operators.cdc import apply_cdc
    from projetos_etl_spark.operators.tablelog import commit, read

    table = scratch_path("tlmerge_scratch")
    shutil.rmtree(table, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    commit(orders, table, "append")
    updates = orders.filter(F.col("o_orderstatus") == "P").select(
        "o_orderkey",
        F.lit("U").alias("op"),
        F.lit(1).alias("seq"),
        "o_orderstatus",
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
    )
    deletes = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("D").alias("op"),
        F.lit(2).alias("seq"),
        "o_orderstatus",
        "o_totalprice",
    )
    base_v1 = read(spark, table, 1)
    merged = apply_cdc(
        base_v1, updates.unionByName(deletes), key="o_orderkey"
    )
    commit(merged, table, "overwrite")
    snaps = []
    for v in (1, 2):
        snaps.append(
            read(spark, table, v).agg(
                F.lit(v).alias("version"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.round(F.sum("o_totalprice"), 0).alias("total"),
            )
        )
    return snaps[0].unionByName(snaps[1]).orderBy("version")


@REG.add(
    "maintenance_tablelog_vacuum",
    # coalesce(1) per commit pins the file counts, so the sweep's audit
    # numbers are plan-independent integers; the surviving snapshot is a
    # pure selection of the source view.
    oracle="""
    SELECT 3 AS versions_before, 2 AS versions_after,
           3 AS files_before, 1 AS files_deleted,
           CAST((SELECT count(*) FROM nation WHERE n_regionkey <= 1)
                AS BIGINT) AS rows_latest,
           TRUE AS history_still_reads
    """,
)
def maintenance_tablelog_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM for the version-manifest table log
    (``operators/tablelog.vacuum``): drop all but the newest N manifests
    and delete data files referenced only by dropped versions — the
    Delta retention division of labor (commits never delete; a separate
    bounded sweep does). History: overwrite/overwrite/append, keep the
    last 2 → exactly the first overwrite's file is unreferenced and
    removed, the shared append-chain files survive, and the kept
    versions still read by manifest afterwards (asserted into the
    ``history_still_reads`` flag). At 100 TB the sweep is a manifest
    set-difference plus deletes — metadata-bounded, never a data scan."""
    import shutil

    from projetos_etl_spark.operators.tablelog import commit, read, vacuum

    # Per-process scratch (scratch.py) so concurrent sessions on one
    # host can't clobber each other's log mid-run; the returned
    # DataFrame scans the kept files lazily, so the dir must outlive
    # this function — dead sessions' dirs are pruned by the next run.
    table = scratch_path("tlvacuum_scratch")
    shutil.rmtree(table, ignore_errors=True)
    nation = load_table(spark, sf_dir, "nation")
    commit(nation.filter(F.col("n_regionkey") == 0).coalesce(1), table, "overwrite")
    commit(nation.filter(F.col("n_regionkey") == 0).coalesce(1), table, "overwrite")
    commit(nation.filter(F.col("n_regionkey") == 1).coalesce(1), table, "append")
    # min_age_seconds=0: hermetic single-writer run on files written
    # milliseconds ago; the production default keeps a staleness window.
    audit = vacuum(table, keep_last=2, min_age_seconds=0.0)
    latest = read(spark, table)
    v2_rows = read(spark, table, 2).count()
    still_reads = v2_rows == nation.filter(F.col("n_regionkey") == 0).count()
    return latest.agg(
        F.lit(audit["versions_before"]).alias("versions_before"),
        F.lit(audit["versions_after"]).alias("versions_after"),
        F.lit(audit["files_before"]).alias("files_before"),
        F.lit(audit["files_deleted"]).alias("files_deleted"),
        F.count(F.lit(1)).cast("long").alias("rows_latest"),
        F.lit(still_reads).alias("history_still_reads"),
    )
