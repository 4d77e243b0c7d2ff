package graft.oracle

import graft.oracle.OracleDialect._

/** DuckDB oracle SQL — analytics tier
  * (57 queries after the round-12 OracleWarehouse split). Values are verbatim from SparkEntry.scala
  * (round-11 mechanical split); SparkEntry.oracleSql concatenates the
  * domain maps, and QueriesSpec pins key-set equality (both directions) with the
  * query registry. */
object OracleAnalytics {
  private[graft] val sql: Map[String, String] = Map(
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
    "q42_key_in_range" ->
      """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
        |FROM orders
        |WHERE o_custkey IN (1, 7, 42, 99, 123)
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |  AND o_totalprice > 0
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    "q43_running_total" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
        |       CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT))
        |              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0
        |         AS cum_total
        |FROM orders
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    "q44_monthly_rollup" ->
      s"""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |       COUNT(*) AS n_orders,
         |       ${moneySum("o_totalprice")} AS total_amount
         |FROM orders
         |GROUP BY 1
         |ORDER BY month""".stripMargin,
    "q46_asof_join" ->
      """WITH refs AS (
        |  SELECT o_custkey, o_orderdate AS ref_ts, o_orderkey AS ref_orderkey,
        |         o_totalprice AS ref_price
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                                     ORDER BY o_orderkey DESC) AS rn
        |        FROM orders WHERE o_totalprice > 200000)
        |  WHERE rn = 1)
        |SELECT l.o_custkey, l.o_orderkey, CAST(l.o_orderdate AS DATE) AS order_date,
        |       l.o_totalprice, r.ref_orderkey, r.ref_price
        |FROM orders l
        |ASOF LEFT JOIN refs r
        |  ON l.o_custkey = r.o_custkey AND l.o_orderdate >= r.ref_ts
        |ORDER BY l.o_custkey, order_date, l.o_orderkey""".stripMargin,
    "q69_status_pivot" -> {
      def n(s: String, a: String) =
        s"CAST(SUM(CASE WHEN o_orderstatus = '$s' THEN 1 ELSE 0 END) AS BIGINT) AS $a"
      def amt(s: String, a: String) =
        s"CAST(SUM(CASE WHEN o_orderstatus = '$s' THEN ${cents("o_totalprice")} ELSE 0 END) AS DOUBLE)/100.0 AS $a"
      s"""SELECT o_orderpriority,
         |       ${n("F", "f_n")}, ${amt("F", "f_amt")},
         |       ${n("O", "o_n")}, ${amt("O", "o_amt")},
         |       ${n("P", "p_n")}, ${amt("P", "p_amt")}
         |FROM orders
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin
    },
    "q70_revenue_rollup" ->
      s"""SELECT COALESCE(r.r_name, 'ALL') AS market,
         |       COALESCE(n.n_name, 'ALL') AS nation,
         |       CASE WHEN r.r_name IS NULL AND n.n_name IS NULL THEN 2
         |            WHEN n.n_name IS NULL THEN 1 ELSE 0 END AS lvl,
         |       COUNT(*) AS n_items,
         |       ${moneySum("l.l_extendedprice")} AS total
         |FROM lineitem l
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY ROLLUP(r.r_name, n.n_name)
         |ORDER BY lvl, market, nation""".stripMargin,
    "q71_revenue_quartiles" ->
      s"""WITH totals AS (
         |  SELECT o_custkey, ${moneySum("o_totalprice")} AS total
         |  FROM orders GROUP BY o_custkey),
         |j AS (
         |  SELECT c.c_mktsegment, t.o_custkey, t.total,
         |         NTILE(4) OVER (PARTITION BY c.c_mktsegment
         |           ORDER BY t.total DESC, t.o_custkey) AS quartile
         |  FROM totals t JOIN customer c ON t.o_custkey = c.c_custkey)
         |SELECT c_mktsegment, quartile, COUNT(*) AS n_customers,
         |       ${moneySum("total")} AS sum_total,
         |       MIN(total) AS min_total, MAX(total) AS max_total
         |FROM j
         |GROUP BY c_mktsegment, quartile
         |ORDER BY c_mktsegment, quartile""".stripMargin,
    "q72_gap_fill" ->
      s"""WITH b AS (
         |  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS mn,
         |         CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS mx
         |  FROM orders),
         |spine AS (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS DATE) AS month FROM b),
         |monthly AS (
         |  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |         ${moneySum("o_totalprice")} AS amt
         |  FROM orders WHERE o_custkey < 20
         |  GROUP BY 1, 2),
         |keys AS (SELECT DISTINCT o_custkey FROM monthly),
         |g AS (SELECT k.o_custkey, s.month, m.amt
         |      FROM keys k CROSS JOIN spine s
         |      LEFT JOIN monthly m ON k.o_custkey = m.o_custkey AND s.month = m.month)
         |SELECT o_custkey, month,
         |       COALESCE(last_value(amt IGNORE NULLS) OVER (
         |         PARTITION BY o_custkey ORDER BY month
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS amt_filled,
         |       CASE WHEN amt IS NULL THEN 1 ELSE 0 END AS is_gap
         |FROM g
         |ORDER BY o_custkey, month""".stripMargin,
    "q79_max_drawdown" ->
      """WITH p AS (
        |  SELECT o_custkey, o_totalprice,
        |         MAX(o_totalprice) OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM orders)
        |SELECT o_custkey, COUNT(*) AS n_orders,
        |       MAX(o_totalprice) AS peak_price,
        |       ROUND(MIN(o_totalprice / peak - 1), 4) AS max_drawdown
        |FROM p
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,
    "q80_volatility" ->
      """WITH r AS (
        |  SELECT o_custkey,
        |         o_totalprice / lag(o_totalprice) OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) - 1 AS ret,
        |         lag(o_totalprice) OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) AS prev_price
        |  FROM orders)
        |SELECT o_custkey, COUNT(*) AS n_returns,
        |       ROUND(AVG(ret), 4) AS mean_return,
        |       ROUND(STDDEV_SAMP(ret), 4) AS volatility
        |FROM r
        |WHERE prev_price IS NOT NULL AND prev_price > 0
        |GROUP BY o_custkey
        |HAVING COUNT(*) >= 2
        |ORDER BY o_custkey""".stripMargin,
    "q81_top_per_group" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, ${moneySum("l_extendedprice")} AS revenue
         |  FROM lineitem GROUP BY l_suppkey),
         |j AS (
         |  SELECT n.n_name, s.s_suppkey, s.s_name, r.revenue,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY n.n_name
         |           ORDER BY r.revenue DESC, s.s_suppkey) AS INT) AS rank
         |  FROM rev r
         |  JOIN supplier s ON r.l_suppkey = s.s_suppkey
         |  JOIN nation n ON s.s_nationkey = n.n_nationkey)
         |SELECT n_name, rank, s_suppkey, s_name, revenue
         |FROM j WHERE rank <= 5
         |ORDER BY n_name, rank""".stripMargin,
    "q82_set_ops" ->
      """WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
        |             WHERE year(o_orderdate) = 1995),
        |y96 AS (SELECT DISTINCT o_custkey FROM orders
        |        WHERE year(o_orderdate) = 1996)
        |SELECT 'both_years' AS cohort, o_custkey
        |FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96) a
        |UNION ALL
        |SELECT 'only_1995' AS cohort, o_custkey
        |FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96) b
        |ORDER BY cohort, o_custkey""".stripMargin,
    // Frame sums accumulate integer cents (the windowed moneySum idiom) so
    // both engines divide identical exact integers — no rounding needed.
    "q83_moving_average" ->
      """WITH c AS (
        |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |         o_totalprice,
        |         CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, order_date, o_totalprice,
        |       CAST(COUNT(*) OVER w AS INT) AS n_in_frame,
        |       CAST(SUM(cents) OVER w AS DOUBLE)/100.0/(COUNT(*) OVER w) AS ma_price
        |FROM c
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY order_date, o_orderkey
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    // σ from the exact integer identity n·Σx²−(Σx)² over frame cents; the
    // breakout comparisons run on unrounded IEEE-identical values, display
    // columns rounded after.
    "q84_bollinger_bands" ->
      """WITH c AS (
        |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |         o_totalprice,
        |         CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents
        |  FROM orders),
        |f AS (
        |  SELECT o_custkey, o_orderkey, order_date, o_totalprice,
        |         SUM(cents) OVER w AS s1,
        |         SUM(cents*cents) OVER w AS s2,
        |         COUNT(*) OVER w AS nf
        |  FROM c
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY order_date, o_orderkey
        |               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)),
        |b AS (
        |  SELECT *, CAST(s1 AS DOUBLE)/100.0/nf AS ma,
        |         sqrt(CAST(nf*s2 - s1*s1 AS DOUBLE) /
        |              CAST(nf*(nf-1) AS DOUBLE))/100.0 AS sd
        |  FROM f WHERE nf >= 2)
        |SELECT o_custkey, o_orderkey, order_date, o_totalprice,
        |       CAST(nf AS INT) AS n_in_frame,
        |       ma AS ma_price, ROUND(sd, 4) AS band_sd,
        |       CAST(o_totalprice > ma + 2*sd AS INT) AS breakout_up,
        |       CAST(o_totalprice < ma - 2*sd AS INT) AS breakout_down
        |FROM b
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    // Series reduce to exact cents-sum revenues before any window/join;
    // covar_pop/var_pop are order-dependent O(1) accumulations → final
    // ratio rounded, the q07 corr contract.
    "q85_beta_vs_market" ->
      s"""WITH li AS (
         |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS d, l_extendedprice
         |  FROM lineitem),
         |daily AS (
         |  SELECT l_suppkey, d, ${moneySum("l_extendedprice")} AS rev
         |  FROM li GROUP BY 1, 2),
         |market AS (
         |  SELECT d, ${moneySum("l_extendedprice")} AS mkt_rev
         |  FROM li GROUP BY 1),
         |rets AS (
         |  SELECT l_suppkey, d,
         |         lag(d) OVER (PARTITION BY l_suppkey ORDER BY d) AS prev_d,
         |         lag(rev) OVER (PARTITION BY l_suppkey ORDER BY d) AS prev_rev,
         |         rev
         |  FROM daily),
         |j AS (
         |  SELECT r.l_suppkey,
         |         r.rev / r.prev_rev - 1 AS ret_s,
         |         m1.mkt_rev / m2.mkt_rev - 1 AS ret_m
         |  FROM rets r
         |  JOIN market m1 ON r.d = m1.d
         |  JOIN market m2 ON r.prev_d = m2.d
         |  WHERE r.prev_rev IS NOT NULL AND r.prev_rev > 0 AND m2.mkt_rev > 0)
         |SELECT l_suppkey, COUNT(*) AS n_days,
         |       ROUND(covar_pop(ret_s, ret_m) / var_pop(ret_m), 4) AS beta,
         |       ROUND(corr(ret_s, ret_m), 4) AS mkt_corr
         |FROM j
         |GROUP BY l_suppkey
         |HAVING COUNT(*) >= 10
         |ORDER BY l_suppkey""".stripMargin,
    // GROUPING(a, b) bit order (first arg = MSB) matches Spark's
    // grouping_id() over the same column list.
    "q86_cube_summary" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         |       COALESCE(l_linestatus, 'ALL') AS linestatus,
         |       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
         |       COUNT(*) AS n_items,
         |       ${moneySum("l_quantity")} AS sum_qty,
         |       ${moneySum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY gid, returnflag, linestatus""".stripMargin,
    "q87_unpivot_metrics" ->
      s"""WITH wide AS (
         |  SELECT l_returnflag,
         |         CAST(COUNT(*) AS DOUBLE) AS n_items,
         |         ${moneySum("l_quantity")} AS sum_qty,
         |         ${moneySum("l_extendedprice")} AS sum_price,
         |         ${moneySum("l_discount")} AS sum_disc
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, metric, value FROM (
         |  SELECT l_returnflag, 'n_items' AS metric, n_items AS value FROM wide
         |  UNION ALL
         |  SELECT l_returnflag, 'sum_qty', sum_qty FROM wide
         |  UNION ALL
         |  SELECT l_returnflag, 'sum_price', sum_price FROM wide
         |  UNION ALL
         |  SELECT l_returnflag, 'sum_disc', sum_disc FROM wide)
         |ORDER BY l_returnflag, metric""".stripMargin,
    // Gains/losses are integer cents; the count terms of avg-gain /
    // avg-loss cancel, so RSI = 100·Σgain/(Σgain+Σloss) divides two
    // exact integers (flat frame → neutral 50 by convention).
    "q89_rsi" ->
      s"""WITH c AS (
         |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
         |         o_totalprice, ${cents("o_totalprice")} AS px
         |  FROM orders),
         |l AS (
         |  SELECT *, px - lag(px) OVER (PARTITION BY o_custkey
         |            ORDER BY order_date, o_orderkey) AS chg
         |  FROM c),
         |g AS (
         |  SELECT o_custkey, o_orderkey, order_date, o_totalprice,
         |         CASE WHEN chg > 0 THEN chg ELSE 0 END AS gain,
         |         CASE WHEN chg < 0 THEN -chg ELSE 0 END AS loss
         |  FROM l WHERE chg IS NOT NULL),
         |f AS (
         |  SELECT o_custkey, o_orderkey, order_date, o_totalprice,
         |         CAST(SUM(gain) OVER w AS BIGINT) AS sg,
         |         CAST(SUM(loss) OVER w AS BIGINT) AS sl,
         |         COUNT(*) OVER w AS nc
         |  FROM g
         |  WINDOW w AS (PARTITION BY o_custkey ORDER BY order_date, o_orderkey
         |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         |SELECT o_custkey, o_orderkey, order_date, o_totalprice,
         |       CASE WHEN sg + sl = 0 THEN 50.0
         |            ELSE CAST((sg * 1000000) // (sg + sl) AS DOUBLE)/10000.0
         |       END AS rsi
         |FROM f WHERE nc = 14
         |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    // Numerator and denominator both accumulate integer centi-units; the
    // VWAP is fixed-point floor(p·10⁴/q)/10⁴ — all-integer until one
    // exact final division, immune to the ROUND(p/q) half-tie where the
    // shortest-decimal (Spark HALF_UP) and binary-double (DuckDB)
    // roundings disagree.
    "q90_vwap" ->
      s"""SELECT l_suppkey,
         |       date_trunc('month', CAST(l_shipdate AS DATE)) AS month,
         |       COUNT(*) AS n_items,
         |       CAST(SUM(${cents("l_quantity")}) AS DOUBLE)/100.0 AS total_qty,
         |       ${moneySum("l_extendedprice")} AS total_notional,
         |       CAST((CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) * 10000) //
         |            CAST(SUM(${cents("l_quantity")}) AS BIGINT) AS DOUBLE)/10000.0
         |         AS vwap
         |FROM lineitem
         |GROUP BY 1, 2
         |ORDER BY l_suppkey, month""".stripMargin,
    // Open/close = price at the (date, orderkey) extremes of the week;
    // both engines truncate weeks to the ISO Monday.
    "q91_weekly_ohlc" ->
      s"""WITH c AS (
         |  SELECT o_custkey, date_trunc('week', CAST(o_orderdate AS DATE)) AS week,
         |         CAST(o_orderdate AS DATE) AS d, o_orderkey, o_totalprice
         |  FROM orders),
         |r AS (
         |  SELECT *,
         |         row_number() OVER (PARTITION BY o_custkey, week
         |           ORDER BY d, o_orderkey) AS rn_a,
         |         row_number() OVER (PARTITION BY o_custkey, week
         |           ORDER BY d DESC, o_orderkey DESC) AS rn_d
         |  FROM c)
         |SELECT o_custkey, week,
         |       MAX(CASE WHEN rn_a = 1 THEN o_totalprice END) AS open,
         |       MAX(o_totalprice) AS high,
         |       MIN(o_totalprice) AS low,
         |       MAX(CASE WHEN rn_d = 1 THEN o_totalprice END) AS close,
         |       COUNT(*) AS n_orders,
         |       ${moneySum("o_totalprice")} AS volume
         |FROM r
         |GROUP BY o_custkey, week
         |ORDER BY o_custkey, week""".stripMargin,
    // Change sign is an exact integer-cents compare; breadth divides two
    // exact counts.
    "q92_market_breadth" ->
      s"""WITH c AS (
         |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_date, o_orderkey,
         |         ${cents("o_totalprice")} AS px
         |  FROM orders),
         |l AS (
         |  SELECT *, px - lag(px) OVER (PARTITION BY o_custkey
         |            ORDER BY order_date, o_orderkey) AS chg
         |  FROM c)
         |SELECT order_date,
         |       CAST(SUM(CASE WHEN chg > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         |       CAST(SUM(CASE WHEN chg < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
         |       CAST(SUM(CASE WHEN chg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flat,
         |       ROUND(CAST(SUM(CASE WHEN chg > 0 THEN 1 ELSE 0 END) -
         |                  SUM(CASE WHEN chg < 0 THEN 1 ELSE 0 END) AS DOUBLE) /
         |             COUNT(*), 6) AS breadth
         |FROM l WHERE chg IS NOT NULL
         |GROUP BY order_date
         |ORDER BY order_date""".stripMargin,
    // Gaps-and-islands: island id = running count of non-up rows, so a
    // maximal run of strictly-increasing prices shares one island; the
    // NULL first-row compare falls to the ELSE 0 branch on both engines.
    "q93_up_streaks" ->
      s"""WITH c AS (
         |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_date, o_orderkey,
         |         ${cents("o_totalprice")} AS px
         |  FROM orders),
         |l AS (
         |  SELECT *, CASE WHEN px > lag(px) OVER (PARTITION BY o_custkey
         |              ORDER BY order_date, o_orderkey) THEN 1 ELSE 0 END AS up
         |  FROM c),
         |i AS (
         |  SELECT *, SUM(1 - up) OVER (PARTITION BY o_custkey
         |            ORDER BY order_date, o_orderkey
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         |  FROM l),
         |g AS (SELECT o_custkey, island, SUM(up) AS run_len, COUNT(*) AS n_rows
         |      FROM i GROUP BY 1, 2)
         |SELECT o_custkey, CAST(MAX(run_len) AS INT) AS longest_up_streak,
         |       CAST(SUM(n_rows) AS INT) AS n_orders
         |FROM g GROUP BY o_custkey
         |ORDER BY o_custkey""".stripMargin,
    // DuckDB's native ASOF finds the latest at-or-before match; the
    // staleness bound then nulls out matches older than 7 days — the
    // same post-match projection semantics as AsOfJoin.asOfWithin.
    "q97_asof_tolerance" ->
      """WITH refs AS (
        |  SELECT o_custkey, o_orderdate AS ref_ts, o_orderkey AS ref_orderkey,
        |         o_totalprice AS ref_price
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                                     ORDER BY o_orderkey DESC) AS rn
        |        FROM orders WHERE o_totalprice > 200000)
        |  WHERE rn = 1),
        |m AS (
        |  SELECT l.o_custkey, l.o_orderkey, CAST(l.o_orderdate AS DATE) AS order_date,
        |         l.o_totalprice, r.ref_orderkey, r.ref_price,
        |         date_diff('day', CAST(r.ref_ts AS DATE), CAST(l.o_orderdate AS DATE)) AS age
        |  FROM orders l
        |  ASOF LEFT JOIN refs r
        |    ON l.o_custkey = r.o_custkey AND l.o_orderdate >= r.ref_ts)
        |SELECT o_custkey, o_orderkey, order_date, o_totalprice,
        |       CASE WHEN age <= 7 THEN ref_orderkey END AS ref_orderkey,
        |       CASE WHEN age <= 7 THEN ref_price END AS ref_price,
        |       CAST(CASE WHEN age <= 7 THEN age END AS INT) AS staleness_days
        |FROM m
        |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    // HHI = Σc²/(Σc)² over integer cents; squares accumulate in HUGEINT
    // (Spark mirrors with DECIMAL(38)) so the ratio divides exact
    // integers converted once to double.
    "q98_hhi_concentration" ->
      s"""WITH monthly AS (
         |  SELECT l_suppkey, date_trunc('month', CAST(l_shipdate AS DATE)) AS month,
         |         CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) AS c
         |  FROM lineitem GROUP BY 1, 2)
         |SELECT month, CAST(COUNT(*) AS INT) AS n_suppliers,
         |       CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)/100.0 AS total_rev,
         |       ROUND(CAST(MAX(c) AS DOUBLE)/CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE), 6) AS top_share,
         |       ROUND(CAST(SUM(CAST(c AS HUGEINT)*c) AS DOUBLE) /
         |             (CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)*CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)), 6) AS hhi
         |FROM monthly
         |GROUP BY month
         |ORDER BY month""".stripMargin,
    // Ranks are dense integers over the unique (cents desc, suppkey)
    // order; the shift compares a supplier's consecutive ACTIVE months.
    "q99_rank_shift" ->
      s"""WITH monthly AS (
         |  SELECT l_suppkey, date_trunc('month', CAST(l_shipdate AS DATE)) AS month,
         |         CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) AS c
         |  FROM lineitem GROUP BY 1, 2),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY month
         |              ORDER BY c DESC, l_suppkey) AS rnk
         |  FROM monthly),
         |shifted AS (
         |  SELECT *, lag(rnk) OVER (PARTITION BY l_suppkey ORDER BY month) AS prev_rnk
         |  FROM ranked)
         |SELECT l_suppkey, month, CAST(c AS DOUBLE)/100.0 AS revenue,
         |       CAST(rnk AS INT) AS rnk, CAST(prev_rnk AS INT) AS prev_rnk,
         |       CAST(prev_rnk - rnk AS INT) AS shift
         |FROM shifted WHERE prev_rnk IS NOT NULL
         |ORDER BY l_suppkey, month""".stripMargin,
    // percent_rank/cume_dist over the unique (cents, custkey) order —
    // both engines divide the same small integers.
    "q100_percentile_report" ->
      s"""WITH rev AS (
         |  SELECT o_custkey, CAST(SUM(${cents("o_totalprice")}) AS BIGINT) AS c
         |  FROM orders GROUP BY o_custkey),
         |seg AS (
         |  SELECT c_mktsegment, o_custkey, c
         |  FROM rev JOIN customer ON o_custkey = c_custkey)
         |SELECT c_mktsegment, o_custkey, CAST(c AS DOUBLE)/100.0 AS revenue,
         |       ROUND(percent_rank() OVER w, 6) AS pct_rank,
         |       ROUND(cume_dist() OVER w, 6) AS cume
         |FROM seg
         |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c ASC, o_custkey ASC)
         |ORDER BY c_mktsegment, o_custkey""".stripMargin,
    // Day-close price (highest (orderkey, linenumber) row of the day)
    // weighted by calendar days current, last price carried to month
    // end; fixed-point floor division as in q90.
    "q101_twap" ->
      s"""WITH daily AS (
         |  SELECT l_suppkey, d, px, date_trunc('month', d) AS month FROM (
         |    SELECT l_suppkey, CAST(l_shipdate AS DATE) AS d,
         |           ${cents("l_extendedprice")} AS px,
         |           row_number() OVER (PARTITION BY l_suppkey, CAST(l_shipdate AS DATE)
         |             ORDER BY l_orderkey DESC, l_linenumber DESC, ${cents("l_extendedprice")} DESC) AS rn
         |    FROM lineitem) z
         |  WHERE rn = 1),
         |spans AS (
         |  SELECT *, lead(d) OVER (PARTITION BY l_suppkey, month ORDER BY d) AS next_d
         |  FROM daily),
         |wtd AS (
         |  SELECT l_suppkey, month,
         |         date_diff('day', d, COALESCE(next_d, last_day(d) + 1)) AS w_days, px
         |  FROM spans)
         |SELECT l_suppkey, month, CAST(COUNT(*) AS INT) AS n_price_days,
         |       CAST(SUM(w_days) AS INT) AS span_days,
         |       CAST((CAST(SUM(w_days * px) AS BIGINT) * 100) //
         |            CAST(SUM(w_days) AS BIGINT) AS DOUBLE)/10000.0 AS twap
         |FROM wtd
         |GROUP BY l_suppkey, month
         |ORDER BY l_suppkey, month""".stripMargin,
    // Class boundaries are all-integer compares over exact cents
    // (cum·5 ≤ total·4, cum·20 ≤ total·19); the display share is
    // fixed-point floor division — no float threshold anywhere.
    "q104_pareto_abc" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) AS c
         |  FROM lineitem GROUP BY l_suppkey),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM rev),
         |cm AS (
         |  SELECT l_suppkey, c,
         |         CAST(SUM(c) OVER (ORDER BY c DESC, l_suppkey
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM rev)
         |SELECT l_suppkey, CAST(c AS DOUBLE)/100.0 AS revenue,
         |       CAST(CAST((CAST(cum AS HUGEINT) * 1000000) // total AS BIGINT)
         |            AS DOUBLE)/1000000.0 AS cum_share,
         |       CASE WHEN cum * 5 <= total * 4 THEN 'A'
         |            WHEN cum * 20 <= total * 19 THEN 'B'
         |            ELSE 'C' END AS abc_class
         |FROM cm CROSS JOIN tot
         |ORDER BY revenue DESC, l_suppkey""".stripMargin,
    // Median and MAD are type-7 percentiles over exact integer cents
    // (quantile_cont ≡ Spark `percentile`), so both engines score with
    // the identical doubles; only the display score is rounded.
    "q106_robust_anomalies" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS d,
         |         CAST(SUM(${cents("o_totalprice")}) AS BIGINT) AS c
         |  FROM orders GROUP BY 1),
         |med AS (SELECT quantile_cont(c, 0.5) AS med FROM daily),
         |mad AS (SELECT quantile_cont(ABS(c - med), 0.5) AS mad
         |        FROM daily CROSS JOIN med)
         |SELECT d, CAST(c AS DOUBLE)/100.0 AS revenue,
         |       med/100.0 AS median_rev, mad/100.0 AS mad_rev,
         |       ROUND((c - med)/(mad*1.4826), 4) AS robust_score
         |FROM daily CROSS JOIN med CROSS JOIN mad
         |WHERE ABS((c - med)/(mad*1.4826)) > 3.0
         |ORDER BY d""".stripMargin,
    // Rolling min/max of exact cents; %K is fixed-point floor division
    // with 50.0 on a flat channel (the q89 convention).
    "q107_stochastic_k" ->
      s"""WITH c AS (
         |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
         |         o_totalprice, ${cents("o_totalprice")} AS px
         |  FROM orders),
         |f AS (
         |  SELECT o_custkey, o_orderkey, order_date, o_totalprice, px,
         |         CAST(MIN(px) OVER w AS BIGINT) AS lo,
         |         CAST(MAX(px) OVER w AS BIGINT) AS hi,
         |         COUNT(*) OVER w AS nw
         |  FROM c
         |  WINDOW w AS (PARTITION BY o_custkey ORDER BY order_date, o_orderkey
         |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         |SELECT o_custkey, o_orderkey, order_date, o_totalprice,
         |       CAST(lo AS DOUBLE)/100.0 AS low_n,
         |       CAST(hi AS DOUBLE)/100.0 AS high_n,
         |       CASE WHEN hi = lo THEN 50.0
         |            ELSE CAST((px - lo) * 1000000 // (hi - lo) AS DOUBLE)/10000.0
         |       END AS pct_k
         |FROM f WHERE nw = 14
         |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin,
    // Signed centi-quantities under an integer-cents price tick; the
    // running sum is per-supplier (both engines see the same unique
    // (shipdate, orderkey, linenumber) order).
    "q108_obv" ->
      s"""WITH l AS (
         |  SELECT l_suppkey, l_orderkey, l_linenumber,
         |         CAST(l_shipdate AS DATE) AS ship_date, l_quantity,
         |         ${cents("l_extendedprice")} AS px,
         |         ${cents("l_quantity")} AS qc
         |  FROM lineitem),
         |s AS (
         |  SELECT *, px - lag(px) OVER w AS chg
         |  FROM l
         |  WINDOW w AS (PARTITION BY l_suppkey
         |               ORDER BY ship_date, l_orderkey, l_linenumber, qc, px)),
         |v AS (
         |  SELECT *, CASE WHEN chg > 0 THEN qc
         |                 WHEN chg < 0 THEN -qc
         |                 ELSE 0 END AS sv
         |  FROM s)
         |SELECT l_suppkey, l_orderkey, l_linenumber, ship_date, l_quantity,
         |       CAST(CAST(SUM(sv) OVER (PARTITION BY l_suppkey
         |              ORDER BY ship_date, l_orderkey, l_linenumber, qc, px
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |            AS DOUBLE)/100.0 AS obv
         |FROM v
         |ORDER BY l_suppkey, ship_date, l_orderkey, l_linenumber""".stripMargin,
    // ISO weekday (1 = Monday) on both engines; money columns use the
    // exact integer-cents idiom.
    "q109_weekday_seasonality" ->
      s"""SELECT CAST(isodow(CAST(o_orderdate AS DATE)) AS INT) AS iso_dow,
         |       COUNT(*) AS n_orders,
         |       ${moneySum("o_totalprice")} AS total_rev,
         |       ${moneyAvg("o_totalprice")} AS avg_rev
         |FROM orders
         |GROUP BY 1
         |ORDER BY iso_dow""".stripMargin,
    // The fact reduces to |days| integer-cents rows; adjacency is an
    // equi join on d+1 (gap days drop); corr is display-rounded (r4).
    "q113_revenue_autocorr" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS d,
         |         CAST(SUM(${cents("o_totalprice")}) AS BIGINT) AS c
         |  FROM orders GROUP BY 1)
         |SELECT COUNT(*) AS n_pairs,
         |       ROUND(corr(CAST(a.c AS DOUBLE), CAST(b.c AS DOUBLE)), 4) AS autocorr
         |FROM daily a JOIN daily b ON b.d = a.d + INTERVAL 1 DAY""".stripMargin,
    // The oracle runs the NAIVE inequality join (DuckDB handles it as an
    // IEJoin); the Spark side must produce identical pairs through the
    // bucketized equi-join plan. Inclusive BETWEEN on both engines;
    // synthetic transit duration is all-integer.
    "q114_transit_overlap" ->
      """WITH li AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |         CAST(l_shipdate AS DATE) AS ship
        |  FROM lineitem),
        |iv AS (
        |  SELECT l_suppkey, l_orderkey AS i_orderkey,
        |         l_linenumber AS i_linenumber, ship AS t_start,
        |         ship + CAST(1 + (l_orderkey + l_linenumber) % 14 AS INT) AS t_end
        |  FROM li WHERE l_quantity > 45)
        |SELECT iv.l_suppkey AS l_suppkey, i_orderkey, i_linenumber, t_start, t_end,
        |       COUNT(*) AS n_in_window
        |FROM iv JOIN li p
        |  ON p.l_suppkey = iv.l_suppkey
        | AND p.ship BETWEEN iv.t_start AND iv.t_end
        | AND NOT (p.l_orderkey = i_orderkey AND p.l_linenumber = i_linenumber)
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY 1, 2, 3""".stripMargin,
    // One lead window per key on both engines; zero-length validity
    // (same-day revisions) is deterministic via the orderkey tiebreak.
    "q115_scd2_history" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |                  CAST(o_orderdate AS DATE) AS valid_from, o_totalprice
        |           FROM orders)
        |SELECT o_custkey, o_orderkey, valid_from, o_totalprice,
        |       lead(valid_from) OVER w AS valid_to,
        |       CAST(CASE WHEN lead(valid_from) OVER w IS NULL
        |            THEN 1 ELSE 0 END AS INT) AS is_current
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from, o_orderkey)
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,
    // Two hops of integer micro-unit mass; every per-edge contribution
    // floors BEFORE the sum, so aggregation order cannot matter and
    // both engines land on identical longs.
    "q116_copurchase_rank" ->
      """WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |sd AS (SELECT s, COUNT(*) AS sdeg FROM e GROUP BY s),
        |cd AS (SELECT c, COUNT(*) AS cdeg FROM e GROUP BY c),
        |m1 AS (SELECT e.c, CAST(SUM(1000000 // sd.sdeg) AS BIGINT) AS m1
        |       FROM e JOIN sd ON e.s = sd.s GROUP BY e.c),
        |r2 AS (SELECT e.s, COUNT(*) AS n_customers,
        |              CAST(SUM(m1.m1 // cd.cdeg) AS BIGINT) AS score_units
        |       FROM e JOIN m1 ON e.c = m1.c JOIN cd ON e.c = cd.c
        |       GROUP BY e.s)
        |SELECT s AS l_suppkey, CAST(n_customers AS INT) AS n_customers,
        |       score_units,
        |       CAST(score_units AS DOUBLE)/1000000.0 AS score
        |FROM r2
        |ORDER BY score_units DESC, l_suppkey""".stripMargin,
    // Power-of-two decay by calendar-year age (capped at 9) — integer
    // floor division on both engines; the anchor is the newest order.
    "q118_decayed_revenue" ->
      s"""WITH base AS (
         |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         |         ${cents("o_totalprice")} AS px
         |  FROM orders),
         |anch AS (SELECT MAX(d) AS dmax FROM base),
         |aged AS (
         |  SELECT o_custkey, d, px,
         |         LEAST(year(dmax) - year(d), 9) AS age
         |  FROM base CROSS JOIN anch)
         |SELECT o_custkey, CAST(COUNT(*) AS INT) AS n_orders,
         |       MAX(d) AS last_order,
         |       CAST(CAST(SUM(px) AS BIGINT) AS DOUBLE)/100.0 AS lifetime_rev,
         |       CAST(CAST(SUM(px // ([1,2,4,8,16,32,64,128,256,512][age + 1])) AS BIGINT)
         |            AS DOUBLE)/100.0 AS decayed_rev
         |FROM aged
         |GROUP BY o_custkey
         |ORDER BY decayed_rev DESC, o_custkey""".stripMargin,
    // TPC-H Q5 shape: same-nation customer/supplier revenue by region ×
    // nation; exact integer cents.
    "q121_local_supplier_volume" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_items,
         |       CAST(SUM(${cents("l_extendedprice")}) AS DOUBLE)/100.0 AS revenue
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
         |  AND o_orderdate <  TIMESTAMP '1997-01-01'
         |GROUP BY r_name, n_name
         |ORDER BY r_name, revenue DESC, n_name""".stripMargin,
    // TPC-H Q21 correlation shape over per-(order, supplier) lateness
    // flags: late supplier, some co-supplier, no late co-supplier.
    "q122_sole_blame" ->
      """WITH pairs AS (
        |  SELECT l_orderkey AS okey, l_suppkey AS skey,
        |         MAX(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |                                 CAST(l_shipdate AS DATE)) > 60
        |                  THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |blame AS (
        |  SELECT l.okey, l.skey,
        |         COUNT(*) AS n_others,
        |         CAST(SUM(o.late) AS BIGINT) AS n_other_late
        |  FROM pairs l
        |  JOIN pairs o ON o.okey = l.okey AND o.skey <> l.skey
        |  WHERE l.late = 1
        |  GROUP BY l.okey, l.skey)
        |SELECT skey AS l_suppkey, COUNT(*) AS n_sole_blame_orders
        |FROM blame
        |WHERE n_other_late = 0
        |GROUP BY skey
        |ORDER BY n_sole_blame_orders DESC, l_suppkey""".stripMargin,
    // Explicit set list (both marginals + grand total, no 2-D cell);
    // GROUPING_ID bit semantics match Spark's grouping_id().
    "q123_grouping_sets" ->
      s"""SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
         |       COALESCE(o_orderpriority, 'ALL') AS priority,
         |       CAST(GROUPING_ID(c_mktsegment, o_orderpriority) AS INT) AS gid,
         |       COUNT(*) AS n_orders,
         |       ${moneySum("o_totalprice")} AS total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
         |ORDER BY gid, segment, priority""".stripMargin,
    // Gaps-and-islands interval union: running max of prior ends cuts
    // islands; all arithmetic in exact epoch days.
  )
}
