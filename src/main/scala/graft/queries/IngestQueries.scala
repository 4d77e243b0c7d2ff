package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.{Ingest, Normalize, Validate}
import graft.model.Tables

/** Oracle-checked query wrappers for the ingest operator set (SURVEY.md
  * §2.2/§2.3/§2.8/§4.2), expressed over the driver test tables.
  *
  * The ops themselves live in [[graft.ingest]]; these wrappers pin each one
  * to concrete driver data so the DuckDB gate can hash-compare results.
  */
object IngestQueries {

  /** T4/T5/T6/T7 normalize pipeline on customer: extract the numeric code
    * embedded in c_name (reference: symbol digit-extraction,
    * `krx_delisted_crawler.py:234-241`), lenient-cast it, trim +
    * empty→null the segment. */
  def normalize(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    cust.select(
      col("c_custkey"),
      Normalize.lenientCode(col("c_name")).as("code"),
      Normalize.digitsPrefix(col("c_name"), 6).as("code6"),
      when(trim(col("c_mktsegment")) === "", lit(null))
        .otherwise(trim(col("c_mktsegment"))).as("segment"))
      .orderBy("c_custkey")
  }

  /** P2/P3 + numeric-range validation on events: event_type must be a
    * lowercase word, value in [0, 1000], user present
    * (`sync_delisted_stocks.py:50-101` shape). */
  def validate(spark: SparkSession, dir: String): DataFrame = {
    val ev = Validate.requireColumns(
      Tables.events(spark, dir), Seq("event_id", "ts", "user_id", "event_type", "value"))
    Validate.accept(ev, Seq(
      Validate.keyMatches(col("event_type"), "^[a-z]+$"),
      Validate.nonEmpty(col("event_type")),
      Validate.inRange(col("value"), 0, 1000),
      col("user_id").isNotNull))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** U2 dedupByKey: one deterministic row per l_orderkey. The driver data
    * has duplicate line numbers per order, so the winner order extends to a
    * TOTAL order across remaining columns (SURVEY.md §7.3-1 — ClickHouse
    * keeps an arbitrary tied row; we must not). */
  def dedupByKey(spark: SparkSession, dir: String): DataFrame =
    Ingest.dedupByKey(
      Tables.lineitem(spark, dir),
      Seq("l_orderkey"),
      Seq(col("l_linenumber").desc, col("l_extendedprice").desc,
        col("l_partkey").desc, col("l_suppkey").desc, col("l_quantity").desc,
        col("l_discount").desc, col("l_tax").desc, col("l_shipdate").desc))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy("l_orderkey")

  /** U1 relaxedUnion: customers and suppliers into one entity table;
    * supplier rows have no segment → null-filled by unionByName. */
  def relaxedUnion(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select(
      col("c_custkey").as("entity_key"), col("c_name").as("name"),
      lit("customer").as("kind"), col("c_acctbal").as("acctbal"),
      col("c_mktsegment").as("segment"))
    val sup = Tables.supplier(spark, dir).select(
      col("s_suppkey").as("entity_key"), col("s_name").as("name"),
      lit("supplier").as("kind"), col("s_acctbal").as("acctbal"))
    Ingest.relaxedUnion(Seq(cust, sup))
      .orderBy("kind", "entity_key")
  }

  /** J5 set-based "only new keys": customers whose first order falls in
    * 1998 (present in the incoming year, absent before) — the anti-join
    * that replaces the reference's driver-side set diff
    * (`daily_stock_master_update.py:264-283`). */
  def antiJoinNewKeys(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val incoming = orders.filter(col("o_orderdate") >= lit("1998-01-01"))
    val existing = orders.filter(col("o_orderdate") < lit("1998-01-01"))
    Ingest.newKeys(incoming, existing, Seq("o_custkey"))
      .select("o_custkey").distinct()
      .orderBy("o_custkey")
  }

  /** SNK7 ReplacingMergeTree compaction on events keyed by
    * (user_id, event_type), version = ts, tie-break event_id — the batch
    * equivalent of `OPTIMIZE TABLE ... FINAL`
    * (`price_client.py:275-284`). */
  def compactReplacing(spark: SparkSession, dir: String): DataFrame =
    Ingest.compactReplacing(
      Tables.events(spark, dir),
      Seq("user_id", "event_type"),
      col("ts"), Seq(col("event_id").desc))
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
      .orderBy("user_id", "event_type")

  /** J6 set-based upsert: pre-1998 latest-order-per-customer state merged
    * with the 1998+ incoming batch, last write wins per o_custkey — one
    * shuffle where the reference loops per row (`stock_master.py:144-192`). */
  def upsert(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val existing = orders.filter(col("o_orderdate") < lit("1998-01-01"))
    val incoming = orders.filter(col("o_orderdate") >= lit("1998-01-01"))
    Ingest.upsert(existing, incoming, Seq("o_custkey"),
      col("o_orderdate"), Seq(col("o_orderkey").desc))
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"), col("o_totalprice"))
      .orderBy("o_custkey")
  }

  /** SNK4 update-as-rewrite: flag pre-1995 orders inactive, mirroring
    * `ALTER TABLE stock_master UPDATE is_active=0 WHERE ...`
    * (`stock_master.py:95-111`). */
  def updateWhere(spark: SparkSession, dir: String): DataFrame =
    Ingest.updateWhere(
      Tables.orders(spark, dir),
      col("o_orderdate") < lit("1995-01-01"),
      Map("o_orderstatus" -> lit("X")))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** SNK5 predicate delete: drop BUILDING-segment customers, return the
    * survivor set (`price_client.py:249-273`). */
  def deleteWhere(spark: SparkSession, dir: String): DataFrame =
    Ingest.deleteWhere(Tables.customer(spark, dir),
      col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")

  /** Fixed drop location for the CSV round-trip — the oracle SQL reads
    * the same files via DuckDB `read_csv`, so the path must be static. */
  val CsvDropPath = "/root/repo/data/csv_customer"

  /** Fixed drop location for the JSON-lines round-trip. */
  val JsonDropPath = "/root/repo/data/json_documents"

  /** JSON-lines bulk load: land the documents table as a JSON drop, bulk
    * it back through the declared-schema reader. Same contract as
    * [[csvRoundtrip]]: the oracle compares against the ORIGINAL table,
    * so green means the write → parse → typed-scan loop is lossless
    * (including text with quotes/escapes). */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    graft.sources.JsonSource.write(
      Tables.documents(spark, dir)
        .select("doc_id", "text", "lang", "source", "n_chars"),
      JsonDropPath)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    graft.sources.JsonSource.read(spark, JsonDropPath, schema)
      .orderBy("doc_id")
  }

  /** SRC8 CSV bulk load (`setup_clickhouse.py:143-170`): land the
    * customer table as a CSV drop, then bulk-load it back through the
    * declared-schema reader. Exercises the full write → parse → typed
    * scan path; the oracle reads the identical files with DuckDB
    * `read_csv`, so every parsed value is hash-compared. */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    graft.sources.CsvSource.write(
      Tables.customer(spark, dir)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment"),
      CsvDropPath)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    graft.sources.CsvSource.read(spark, CsvDropPath, schema)
      .orderBy("c_custkey")
  }

  val OrcDropPath = "/root/repo/data/orc_documents"

  /** ORC columnar round-trip (q66): land the documents table as ORC,
    * read it back through the declared-schema vectorized reader. The
    * oracle compares against the ORIGINAL parquet (DuckDB reads no ORC),
    * so green means the parquet → ORC → scan loop is lossless across
    * every type including full text. */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    graft.sources.OrcSource.write(
      Tables.documents(spark, dir)
        .select("doc_id", "text", "lang", "source", "n_chars"),
      OrcDropPath)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    graft.sources.OrcSource.read(spark, OrcDropPath, schema)
      .orderBy("doc_id")
  }
}
