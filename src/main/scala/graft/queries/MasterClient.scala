package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's dimension-side client, reference-shaped: every method
  * of `StockMasterClient` (`/root/reference/src/clickhouse/
  * stock_master.py:50-297`) over a DataFrame in the canonical
  * `stock_master` schema, PLUS the methods the reference's scripts call
  * but never implemented (SURVEY §1.4 "phantom" surface —
  * `scripts/check_stock_data.py:52-90`, `scripts/sync_new_listings.py:
  * 114,182`): total counts, missing-date data-quality probes, the full
  * symbol inventory. Mutations are state-in/state-out (the functional
  * form of ALTER UPDATE / insert-or-skip row loops — one distributed
  * join each, SURVEY §2 J5/J6/SNK4); reads are plain filters over the
  * ReplacingMergeTree view (latest row per symbol).
  */
class MasterClient(master: DataFrame) {

  /** ReplacingMergeTree read view: last write per symbol by update_dt
    * (what ClickHouse resolves lazily at merge time). */
  def current: DataFrame = {
    val w = Window.partitionBy("symbol")
      .orderBy(col("update_dt").desc, col("is_active").asc, col("name").desc)
    master.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** `insert_stocks` (`stock_master.py:50-93`): require key columns,
    * default-fill name/market/is_active, append. Returns the new state. */
  def insertStocks(stocks: DataFrame): DataFrame = {
    val required = Seq("symbol", "name", "market")
    val missing = required.filterNot(stocks.columns.contains)
    require(missing.isEmpty, s"missing required columns: $missing")
    val filled = stocks
      .withColumn("name", coalesce(col("name"), lit("Unknown")))
      .withColumn("market", coalesce(col("market"), lit("UNKNOWN")))
      .withColumn("is_active",
        coalesce(col("is_active"), lit(1)).cast("int"))
    master.unionByName(filled.select(master.columns.map(col): _*),
      allowMissingColumns = false)
  }

  /** `update_delisting_date` (`stock_master.py:95-111`): the ALTER
    * UPDATE as a rewrite — flag one symbol delisted. */
  def updateDelistingDate(symbol: String, delistingDate: String): DataFrame =
    graft.ingest.Ingest.updateWhere(master, col("symbol") === lit(symbol),
      Map("delisting_date" -> lit(delistingDate).cast("date"),
        "is_active" -> lit(0)))

  /** `process_new_listings` (`stock_master.py:144-192`): insert only
    * symbols not present — the reference's per-row exists-probe loop as
    * ONE anti-join. */
  def processNewListings(newListings: DataFrame): DataFrame =
    master.unionByName(
      graft.ingest.Ingest.newKeys(
        newListings.select(master.columns.map(col): _*), master, Seq("symbol")),
      allowMissingColumns = false)

  /** `get_stock_by_symbol` (`stock_master.py:194-225`): latest row for
    * one key (one-row DataFrame, not a driver dict). */
  def getStockBySymbol(symbol: String): DataFrame =
    master.filter(col("symbol") === lit(symbol))
      .orderBy(desc("update_dt")).limit(1)

  /** `get_active_stocks` (`stock_master.py:227-241`). */
  def getActiveStocks(market: Option[String] = None): DataFrame =
    market.fold(current.filter(col("is_active") === 1))(m =>
        current.filter(col("is_active") === 1 && col("market") === lit(m)))
      .orderBy("symbol")

  /** `get_delisted_stocks` (`stock_master.py:243-257`). */
  def getDelistedStocks(market: Option[String] = None): DataFrame =
    market.fold(current.filter(col("is_active") === 0))(m =>
        current.filter(col("is_active") === 0 && col("market") === lit(m)))
      .orderBy(desc("delisting_date"), col("symbol"))

  /** `get_stock_count` (`stock_master.py:259-287`): per-market
    * active/delisted/total. */
  def getStockCount(): DataFrame =
    current.groupBy("market")
      .agg(sum(when(col("is_active") === 1, 1).otherwise(0)).as("active_count"),
        sum(when(col("is_active") === 0, 1).otherwise(0)).as("delisted_count"),
        count(lit(1)).as("total_count"))
      .orderBy("market")

  // ---- the "phantom" intended surface (SURVEY §1.4) ----------------------

  /** `get_total_count` (`check_stock_data.py:60` — called, never
    * implemented). */
  def getTotalCount(): DataFrame =
    current.agg(count(lit(1)).as("total_count"))

  /** `get_all_symbols` (`sync_new_listings.py:114` — called, never
    * implemented). */
  def getAllSymbols(): DataFrame =
    current.select("symbol").distinct().orderBy("symbol")

  /** `get_stocks_missing_listing_date` (`check_stock_data.py:82` —
    * called, never implemented): active rows with no listing date. */
  def getStocksMissingListingDate(): DataFrame =
    current.filter(col("is_active") === 1 && col("listing_date").isNull)
      .orderBy("symbol")

  /** `get_delisted_stocks_missing_date` (`check_stock_data.py:90` —
    * called, never implemented): delisted rows with no delisting date. */
  def getDelistedStocksMissingDate(): DataFrame =
    current.filter(col("is_active") === 0 && col("delisting_date").isNull)
      .orderBy("symbol")

  /** `optimize_table` (`stock_master.py:289-297`): materialize the
    * ReplacingMergeTree view — last write wins per symbol. */
  def optimizeTable(): DataFrame = current
}
