package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's client API surface, reference-shaped: every method of
  * `ClickHouseClient` (`/root/reference/src/clickhouse/client.py:73-235`)
  * and the query half of `StockPriceClient`
  * (`price_client.py:174-299`), over DataFrames carrying the canonical
  * `stock_master` / `stock_price` schemas (SURVEY §1.2). A reference
  * user switches by constructing this class with their two tables; each
  * method is the declarative Spark form of the SQL the reference
  * interpolates — typed parameters instead of f-strings (which also
  * retires that injection surface, SURVEY §3.3).
  *
  * Scale: the master dimension (≈5k rows) broadcasts into every join;
  * price-side work shuffles only on aggregation/window keys; methods
  * return DataFrames (nothing collects — even `getBacktestUniverse`,
  * which the reference materializes into a Python list).
  */
class MarketClient(master: DataFrame, price: DataFrame) {

  private def dim = broadcast(master)

  private def between(c: Column, start: Option[String], end: Option[String]): Column =
    Seq(start.map(c >= lit(_)), end.map(c <= lit(_))).flatten
      .foldLeft(lit(true))(_ && _)

  /** `get_stock_data` (`client.py:73-102`): OHLCV for a symbol set,
    * joined to names, optional date range, (symbol, trade_date) order. */
  def getStockData(symbols: Seq[String], start: Option[String] = None,
                   end: Option[String] = None): DataFrame =
    price.filter(col("symbol").isInCollection(symbols) &&
        between(col("trade_date"), start, end))
      .join(dim.select("symbol", "name"), Seq("symbol"))
      .select(col("symbol"), col("name"), col("trade_date"), col("open_price"),
        col("high_price"), col("low_price"), col("close_price"),
        col("volume"), col("amount"))
      .orderBy("symbol", "trade_date")

  /** `get_market_summary` (`client.py:104-121`): per-market counts and
    * totals for one day, positive closes only. */
  def getMarketSummary(tradeDate: String): DataFrame =
    price.filter(col("trade_date") === lit(tradeDate) && col("close_price") > 0)
      .join(dim.select("symbol", "market"), Seq("symbol"))
      .groupBy("market")
      .agg(count(lit(1)).as("stock_count"),
        avg(col("close_price")).as("avg_price"),
        sum(col("volume")).as("total_volume"),
        sum(col("amount")).as("total_amount"))
      .orderBy(desc("total_amount"))

  /** `get_top_performers` (`client.py:123-150`): best day-over-day
    * change on `tradeDate`. The reference's CTE filters to the target
    * day BEFORE its lag window, which nulls every `prev_close` and
    * returns nothing; this implements the evident intent — previous
    * close comes from each symbol's history, then the day filter
    * applies. */
  def getTopPerformers(tradeDate: String, limit: Int = 20): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("trade_date")
    // The day-equality filter cannot push below the lag window (lag must
    // see earlier rows), but `<= tradeDate` CAN be applied first — lag
    // only looks backward — so the window never sorts future history and
    // month-partition pruning cuts the scan.
    price.filter(col("trade_date") <= lit(tradeDate))
      .select(col("symbol"), col("trade_date"), col("close_price"),
        col("volume"), lag("close_price", 1).over(w).as("prev_close"))
      .filter(col("trade_date") === lit(tradeDate) && col("prev_close") > 0)
      .join(dim.select("symbol", "name"), Seq("symbol"))
      .select(col("symbol"), col("name"), col("close_price"), col("prev_close"),
        ((col("close_price") - col("prev_close")) / col("prev_close") * 100)
          .as("change_pct"),
        col("volume"))
      .orderBy(desc("change_pct"), col("symbol"))
      .limit(limit)
  }

  /** `get_backtest_universe` (`client.py:152-177`): active symbols
    * listed before the window and not delisted inside it; optional
    * min-cap gate via a semi-join on the start-date close×volume. A
    * DataFrame of symbols — deliberately NOT collected. */
  def getBacktestUniverse(start: String, end: String,
                          minMarketCap: Option[Long] = None): DataFrame = {
    val base = master.filter(col("is_active") === 1 &&
        (col("listing_date").isNull || col("listing_date") <= lit(start)) &&
        (col("delisting_date").isNull || col("delisting_date") >= lit(end)))
      .select("symbol").distinct()
    val gated = minMarketCap.fold(base) { cap =>
      base.join(
        price.filter(col("trade_date") === lit(start) &&
          col("close_price") * col("volume") > cap).select("symbol"),
        Seq("symbol"), "left_semi")
    }
    gated.orderBy("symbol")
  }

  /** `calculate_returns` (`client.py:179-202`): daily and cumulative
    * returns per symbol over a window. */
  def calculateReturns(symbols: Seq[String], start: String, end: String): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("trade_date")
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    price.filter(col("symbol").isInCollection(symbols) &&
        col("trade_date").between(lit(start), lit(end)))
      .select(col("symbol"), col("trade_date"), col("close_price"),
        (col("close_price") / lag("close_price", 1).over(w) - 1).as("daily_return"),
        (col("close_price") / first("close_price").over(wAll) - 1).as("cumulative_return"))
      .orderBy("symbol", "trade_date")
  }

  /** `get_correlation_matrix` (`client.py:204-235`): pairwise Pearson
    * corr of daily returns, ≤50 symbols (the reference's guard), keyed
    * self-join on trade_date. */
  def getCorrelationMatrix(symbols: Seq[String], start: String, end: String): DataFrame = {
    val capped = symbols.take(50)
    val w = Window.partitionBy("symbol").orderBy("trade_date")
    val r = price.filter(col("symbol").isInCollection(capped) &&
        col("trade_date").between(lit(start), lit(end)))
      .select(col("symbol"), col("trade_date"),
        (col("close_price") / lag("close_price", 1).over(w) - 1).as("ret"))
      .filter(col("ret").isNotNull)
    r.select(col("symbol").as("symbol_a"), col("trade_date"), col("ret").as("ret_a"))
      .join(r.select(col("symbol").as("symbol_b"), col("trade_date"),
        col("ret").as("ret_b")), Seq("trade_date"))
      .groupBy("symbol_a", "symbol_b")
      .agg(corr(col("ret_a"), col("ret_b")).as("correlation"))
      .orderBy("symbol_a", "symbol_b")
  }

  // ---- price_client query surface ----------------------------------------

  /** `get_price_data_by_symbol` (`price_client.py:185-219`). */
  def getPriceData(symbol: String, start: Option[String] = None,
                   end: Option[String] = None): DataFrame =
    price.filter(col("symbol") === lit(symbol) &&
        between(col("trade_date"), start, end))
      .orderBy("trade_date")

  /** `get_latest_trade_date` (`price_client.py:221-234`) — one-row
    * DataFrame, optionally per symbol. */
  def getLatestTradeDate(symbol: Option[String] = None): DataFrame =
    symbol.fold(price)(s => price.filter(col("symbol") === lit(s)))
      .agg(max("trade_date").as("latest_trade_date"))

  /** `get_symbols_with_data` (`price_client.py:236-247`). */
  def getSymbolsWithData: DataFrame =
    price.select("symbol").distinct().orderBy("symbol")

  /** `delete_price_data` (`price_client.py:249-273`): predicate delete
    * as survivor rewrite; refuses the everything-predicate like the
    * reference refuses an empty WHERE. */
  def deletePriceData(symbol: Option[String] = None, start: Option[String] = None,
                      end: Option[String] = None): DataFrame = {
    require(symbol.nonEmpty || start.nonEmpty || end.nonEmpty,
      "refusing to delete the whole table (reference guard, price_client.py:252)")
    val pred = symbol.fold(lit(true))(s => col("symbol") === lit(s)) &&
      between(col("trade_date"), start, end)
    graft.ingest.Ingest.deleteWhere(price, pred)
  }

  /** `optimize_table` (`price_client.py:275-284`): ReplacingMergeTree
    * FINAL — last write per (symbol, trade_date) by update_dt. */
  def optimizeTable(): DataFrame =
    graft.ingest.Ingest.compactReplacing(price, Seq("symbol", "trade_date"),
      col("update_dt"), Seq(col("close_price").desc))

  /** `get_table_info` rows/keys half (`price_client.py:286-318`) — the
    * storage-layout half lives in [[graft.sources.TableInfo]]. */
  def tableCounts(): DataFrame =
    price.agg(count(lit(1)).as("total_rows"),
      countDistinct(col("symbol")).as("unique_symbols"),
      min("trade_date").as("earliest_date"),
      max("trade_date").as("latest_date"))
}
