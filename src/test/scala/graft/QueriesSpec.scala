package graft

import org.apache.spark.sql.functions._

/** End-to-end sanity over the sf0.001 test tables: every registered query
  * executes, returns rows with the declared (oracle-matching) column set,
  * and the flagship entry behaves. The value-level gate is the DuckDB
  * oracle (graft.Verify + tools/oracle_check.py); this spec catches
  * schema/registration regressions fast.
  */
class QueriesSpec extends SparkSpec {

  test("entry returns top-20 with positive change ordering") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 20)
    val changes = rows.map(_.getAs[Double]("change_pct"))
    assert(changes.zip(changes.tail).forall { case (a, b) => a >= b })
  }

  /** Queries deliberately without oracle SQL — non-oracle-expressible
    * operators (the driver records a rows-only check); each must carry
    * its own value-level spec instead. Currently empty: every registered
    * query is oracle-checked (q68 moved from the Bloom form to the exact
    * md5 anti-join in round 5; the Bloom sketch stays as a library-level
    * scale pre-pass pinned by VersioningSpec). */
  private val rowsOnlyQueries = Set.empty[String]

  test("every registered query has an oracle and runs non-empty on sf0.001") {
    val missingOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet --
      rowsOnlyQueries
    assert(missingOracle.isEmpty, s"queries without oracle: $missingOracle")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sf001)
      val n = df.count()
      assert(n > 0, s"$name returned no rows on sf0.001")
    }
  }

  test("latestPerKey agrees with a groupBy-max cross-check") {
    val byWindow = graft.queries.Analytics.latestPerKey(spark, sf001)
      .select("o_custkey", "latest_date")
    val byAgg = graft.model.Tables.orders(spark, sf001)
      .groupBy("o_custkey")
      .agg(max(col("o_orderdate").cast("date")).as("latest_date"))
    assert(byWindow.join(byAgg, Seq("o_custkey", "latest_date")).count() ==
      byWindow.count())
  }

  test("money aggregation is bit-identical under different partitionings") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val a = graft.queries.Analytics.marketSummary(spark, sf001).collect().toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      val b = graft.queries.Analytics.marketSummary(spark, sf001).collect().toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("dedup tier results are identical under different partitionings") {
    // The hash tiers shuffle integer shingle hashes through staged
    // checkpoints; none of it may depend on partition count or order.
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def run(): Seq[(Long, Long, Double)] =
      graft.queries.ExtQueries.dedupNgramJaccard(spark, sf001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def runLsh(): Seq[(Long, Long, Double)] =
      graft.queries.ExtQueries.dedupMinhashLsh(spark, sf001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val (a1, a2) = (run(), runLsh())
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      assert(run() == a1)
      assert(runLsh() == a2)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("compaction is idempotent") {
    val ev = graft.model.Tables.events(spark, sf001)
    val once = graft.ingest.Ingest.compactReplacing(ev,
      Seq("user_id", "event_type"), col("ts"), Seq(col("event_id").desc))
    val twice = graft.ingest.Ingest.compactReplacing(once,
      Seq("user_id", "event_type"), col("ts"), Seq(col("event_id").desc))
    assert(once.count() == twice.count())
    assert(once.exceptAll(twice).count() == 0)
  }
}
