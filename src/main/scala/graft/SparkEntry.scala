package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, EventWindows, IngestQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 registers here twice: a Spark
  * implementation in [[queries]] and (where SQL-expressible) a DuckDB
  * oracle in [[oracleSql]]. Column names/aliases are kept identical on both
  * sides (the driver sorts columns by name before hashing), every query
  * carries a deterministic total ORDER BY, and float aggregation uses the
  * exact integer-cents idiom of [[graft.model.Parity]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.topPerformers(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_top_performers"   -> ((s, d) => Analytics.topPerformers(s, d)),
    "q02_market_summary"   -> ((s, d) => Analytics.marketSummary(s, d)),
    "q03_daily_summary"    -> ((s, d) => Analytics.dailySummary(s, d)),
    "q04_cond_counts"      -> ((s, d) => Analytics.condCounts(s, d)),
    "q05_distinct_counts"  -> ((s, d) => Analytics.distinctCounts(s, d)),
    "q06_minmax_dates"     -> ((s, d) => Analytics.minMaxDates(s, d)),
    "q07_correlation"      -> ((s, d) => Analytics.correlationMatrix(s, d)),
    "q08_backtest_universe"-> ((s, d) => Analytics.backtestUniverse(s, d)),
    "q09_latest_per_key"   -> ((s, d) => Analytics.latestPerKey(s, d)),
    "q10_returns"          -> ((s, d) => Analytics.returns(s, d)),
    "q11_point_lookup"     -> ((s, d) => Analytics.pointLookupLatest(s, d)),
    "q12_topk_revenue"     -> ((s, d) => Analytics.topK(s, d)),
    "q13_distribution"     -> ((s, d) => Analytics.distribution(s, d)),
    "q14_global_stats"     -> ((s, d) => Analytics.globalStats(s, d)),
    "q15_normalize"        -> ((s, d) => IngestQueries.normalize(s, d)),
    "q16_validate"         -> ((s, d) => IngestQueries.validate(s, d)),
    "q17_dedup_by_key"     -> ((s, d) => IngestQueries.dedupByKey(s, d)),
    "q18_relaxed_union"    -> ((s, d) => IngestQueries.relaxedUnion(s, d)),
    "q19_anti_new_keys"    -> ((s, d) => IngestQueries.antiJoinNewKeys(s, d)),
    "q20_upsert"           -> ((s, d) => IngestQueries.upsert(s, d)),
    "q21_compact_replacing"-> ((s, d) => IngestQueries.compactReplacing(s, d)),
    "q22_update_where"     -> ((s, d) => IngestQueries.updateWhere(s, d)),
    "q23_delete_where"     -> ((s, d) => IngestQueries.deleteWhere(s, d)),
    "q24_tumbling_window"  -> ((s, d) => EventWindows.tumbling(s, d)),
    "q25_sliding_window"   -> ((s, d) => EventWindows.sliding(s, d)),
    "q26_sessionize"       -> ((s, d) => EventWindows.sessionize(s, d)),
    "q27_json_extract"     -> ((s, d) => EventWindows.jsonExtract(s, d)),
  )

  // Shared SQL fragments for the exact money-sum idiom (Parity.scala).
  private def cents(c: String) = s"CAST(ROUND($c*100,0) AS BIGINT)"
  private def moneySum(c: String) = s"CAST(SUM(${cents(c)}) AS DOUBLE)/100.0"
  private def moneyAvg(c: String) = s"CAST(SUM(${cents(c)}) AS DOUBLE)/100.0/COUNT($c)"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_top_performers" ->
      s"""WITH priced AS (
         |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         |         lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
         |  FROM orders)
         |SELECT c.c_custkey, c.c_name, p.o_orderkey,
         |       CAST(p.o_orderdate AS DATE) AS order_date,
         |       p.o_totalprice, p.prev_price,
         |       ROUND((p.o_totalprice - p.prev_price)/p.prev_price*100, 6) AS change_pct
         |FROM priced p JOIN customer c ON p.o_custkey = c.c_custkey
         |WHERE p.prev_price > 0
         |ORDER BY change_pct DESC, p.o_orderkey
         |LIMIT 20""".stripMargin,
    "q02_market_summary" ->
      s"""SELECT r.r_name AS market,
         |       COUNT(*) AS n_items,
         |       ${moneyAvg("l.l_extendedprice")} AS avg_price,
         |       CAST(SUM(CAST(ROUND(l.l_quantity,0) AS BIGINT)) AS BIGINT) AS sum_qty,
         |       ${moneySum("l.l_extendedprice")} AS total_amount
         |FROM lineitem l
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY r.r_name
         |ORDER BY total_amount DESC, market""".stripMargin,
    "q03_daily_summary" ->
      s"""SELECT CAST(o_orderdate AS DATE) AS order_date,
         |       COUNT(*) AS n_orders,
         |       ${moneyAvg("o_totalprice")} AS avg_price,
         |       ${moneySum("o_totalprice")} AS total_amount
         |FROM orders
         |GROUP BY CAST(o_orderdate AS DATE)
         |ORDER BY order_date""".stripMargin,
    "q04_cond_counts" ->
      """SELECT o_orderpriority,
        |       COUNT(*) AS n_total,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q05_distinct_counts" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_suppkey) AS n_suppliers,
        |       COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q06_minmax_dates" ->
      """SELECT l_suppkey,
        |       MIN(CAST(l_shipdate AS DATE)) AS first_ship,
        |       MAX(CAST(l_shipdate AS DATE)) AS last_ship,
        |       COUNT(*) AS n_ship
        |FROM lineitem
        |GROUP BY l_suppkey
        |ORDER BY l_suppkey""".stripMargin,
    "q07_correlation" ->
      s"""WITH dim AS (
         |  SELECT s.s_suppkey, n.n_name
         |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey),
         |daily AS (
         |  SELECT d.n_name, CAST(l.l_shipdate AS DATE) AS d,
         |         ${moneySum("l.l_extendedprice")} AS rev
         |  FROM lineitem l JOIN dim d ON l.l_suppkey = d.s_suppkey
         |  GROUP BY 1, 2)
         |SELECT a.n_name AS key_a, b.n_name AS key_b,
         |       ROUND(corr(a.rev, b.rev), 4) AS correlation,
         |       COUNT(*) AS n_days
         |FROM daily a JOIN daily b ON a.d = b.d
         |WHERE a.n_name < b.n_name
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,
    "q08_backtest_universe" ->
      """SELECT c.c_custkey, c.c_name, c.c_mktsegment
        |FROM customer c
        |WHERE (c.c_acctbal IS NULL OR c.c_acctbal > 0)
        |  AND EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderdate >= TIMESTAMP '1998-01-01'
        |                AND o.o_orderdate <  TIMESTAMP '1999-01-01'
        |                AND o.o_totalprice > 150000)
        |ORDER BY c_custkey""".stripMargin,
    "q09_latest_per_key" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS latest_date, o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "q10_returns" ->
      """WITH w AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |    first_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS base_price
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
        |       ROUND(o_totalprice/prev_price - 1, 6) AS daily_return,
        |       ROUND(o_totalprice/base_price - 1, 6) AS cum_return
        |FROM w
        |WHERE prev_price IS NOT NULL AND prev_price > 0
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    "q11_point_lookup" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
        |FROM orders
        |WHERE o_custkey = 42
        |ORDER BY o_orderdate DESC, o_orderkey DESC
        |LIMIT 1""".stripMargin,
    "q12_topk_revenue" ->
      """SELECT l_orderkey, l_linenumber,
        |       ROUND(l_extendedprice * (1 - l_discount), 4) AS revenue
        |FROM lineitem
        |ORDER BY revenue DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,
    "q13_distribution" ->
      """SELECT c_mktsegment, COUNT(*) AS n
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q14_global_stats" ->
      """SELECT COUNT(*) AS n_rows,
        |       COUNT(DISTINCT l_orderkey) AS n_orders,
        |       COUNT(DISTINCT l_suppkey) AS n_suppliers,
        |       MIN(CAST(l_shipdate AS DATE)) AS min_date,
        |       MAX(CAST(l_shipdate AS DATE)) AS max_date
        |FROM lineitem""".stripMargin,
    "q15_normalize" ->
      """SELECT c_custkey,
        |       TRY_CAST(regexp_replace(c_name, '[^0-9]', '', 'g') AS BIGINT) AS code,
        |       substr(regexp_replace(c_name, '[^0-9]', '', 'g'), 1, 6) AS code6,
        |       NULLIF(trim(c_mktsegment), '') AS segment
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q16_validate" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events
        |WHERE regexp_full_match(event_type, '[a-z]+')
        |  AND event_type IS NOT NULL AND length(event_type) > 0
        |  AND value IS NOT NULL AND value >= 0 AND value <= 1000
        |  AND user_id IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q17_dedup_by_key" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |        ORDER BY l_linenumber DESC, l_extendedprice DESC, l_partkey DESC,
        |                 l_suppkey DESC, l_quantity DESC, l_discount DESC,
        |                 l_tax DESC, l_shipdate DESC) AS rn
        |      FROM lineitem)
        |WHERE rn = 1
        |ORDER BY l_orderkey""".stripMargin,
    "q18_relaxed_union" ->
      """SELECT c_custkey AS entity_key, c_name AS name, 'customer' AS kind,
        |       c_acctbal AS acctbal, c_mktsegment AS segment
        |FROM customer
        |UNION ALL
        |SELECT s_suppkey, s_name, 'supplier', s_acctbal, NULL
        |FROM supplier
        |ORDER BY kind, entity_key""".stripMargin,
    "q19_anti_new_keys" ->
      """SELECT DISTINCT o_custkey
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = o.o_custkey
        |                    AND o2.o_orderdate < TIMESTAMP '1998-01-01')
        |ORDER BY o_custkey""".stripMargin,
    "q20_upsert" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "q21_compact_replacing" ->
      """SELECT user_id, event_type, event_id, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "q22_update_where" ->
      """SELECT CASE WHEN o_orderdate < TIMESTAMP '1995-01-01' THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |       COUNT(*) AS n
        |FROM orders
        |GROUP BY 1
        |ORDER BY o_orderstatus""".stripMargin,
    "q23_delete_where" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE NOT (c_mktsegment = 'BUILDING')
        |ORDER BY c_custkey""".stripMargin,
    "q24_tumbling_window" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
         |       event_type, COUNT(*) AS n_events,
         |       ${moneySum("value")} AS sum_value
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY window_start, event_type""".stripMargin,
    "q25_sliding_window" ->
      s"""SELECT CAST(time_bucket(INTERVAL '30 minutes', ts) AS TIMESTAMP)
         |         - k.k * INTERVAL '30 minutes' AS window_start,
         |       event_type, COUNT(*) AS n_events,
         |       ${moneySum("value")} AS sum_value
         |FROM events CROSS JOIN (VALUES (0), (1)) AS k(k)
         |GROUP BY 1, 2
         |ORDER BY window_start, event_type""".stripMargin,
    "q26_sessionize" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, ts, value,
         |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
         |              THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (
         |  SELECT user_id, ts, value,
         |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM flagged)
         |SELECT user_id, session_id,
         |       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
         |       CAST(MAX(ts) AS TIMESTAMP) AS session_end,
         |       COUNT(*) AS n_events,
         |       ${moneySum("value")} AS sum_value
         |FROM sess
         |GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,
    "q27_json_extract" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |       SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
        |       MIN(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |       MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
  )
}
