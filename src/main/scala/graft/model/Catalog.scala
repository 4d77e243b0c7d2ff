package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SQL-facing catalog: temp views for every test table plus the
  * reference's derived views (`/root/reference/src/setup/
  * setup_clickhouse.py:247-295` — `daily_market_summary`,
  * `latest_prices`). After `registerAll`, the whole engine surface is
  * reachable from `spark.sql(...)` — the reference's users talk SQL, so
  * the rebuild keeps that entry point first-class (views are lazy plans:
  * they optimize into consuming queries exactly like the DataFrame form,
  * including pushdown through the view).
  */
object Catalog {

  /** Register all base tables as temp views named after the files. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { t =>
      (t match {
        case "events" => Tables.events(spark, dir)
        case other    => Tables.load(spark, dir, other)
      }).createOrReplaceTempView(t)
    }

  /** `daily_market_summary` (A2 view): per-date order stats. */
  def dailyMarketSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderdate").cast("date").as("order_date"))
      .agg(count(lit(1)).as("n_orders"),
        Parity.moneyAvg(col("o_totalprice")).as("avg_price"),
        Parity.moneySum(col("o_totalprice")).as("total_amount"))

  /** `latest_prices` (J4 view): latest row per key, decorrelated to a
    * window (the reference writes a correlated scalar subquery). */
  def latestPrices(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_orderdate"), desc("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Register the derived views on top of the base tables. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    dailyMarketSummary(spark, dir).createOrReplaceTempView("daily_market_summary")
    latestPrices(spark, dir).createOrReplaceTempView("latest_prices")
  }
}
