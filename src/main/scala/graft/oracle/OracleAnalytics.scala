package graft.oracle

import graft.oracle.OracleDialect._

/** DuckDB oracle SQL — analytics tier
  * (84 queries). Values are verbatim from SparkEntry.scala
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
    "q143_ship_coverage" ->
      """WITH iv AS (SELECT DISTINCT l_suppkey,
        |              CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS day_start
        |            FROM lineitem),
        |iv2 AS (SELECT l_suppkey, day_start, day_start + 7 AS day_end FROM iv),
        |m AS (SELECT l_suppkey, day_start, day_end,
        |             CASE WHEN max(day_end) OVER wp IS NULL
        |                    OR day_start > max(day_end) OVER wp
        |                  THEN 1 ELSE 0 END AS cut
        |      FROM iv2
        |      WINDOW wp AS (PARTITION BY l_suppkey ORDER BY day_start, day_end
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |i AS (SELECT *, SUM(cut) OVER (PARTITION BY l_suppkey
        |         ORDER BY day_start, day_end
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |      FROM m),
        |isl AS (SELECT l_suppkey, island, MIN(day_start) AS s, MAX(day_end) AS e,
        |               COUNT(*) AS n
        |        FROM i GROUP BY l_suppkey, island)
        |SELECT l_suppkey, CAST(SUM(n) AS BIGINT) AS n_intervals,
        |       COUNT(*) AS n_islands,
        |       CAST(SUM(e - s) AS BIGINT) AS covered_days,
        |       CAST(MAX(e) - MIN(s) AS BIGINT) AS span_days
        |FROM isl GROUP BY l_suppkey
        |ORDER BY l_suppkey""".stripMargin,
    // Skyline stated as the textbook NOT-EXISTS domination predicate —
    // deliberately a DIFFERENT formulation from the engine's staircase
    // window, so the oracle checks the algorithm, not the plan.
    "q146_brand_skyline" ->
      """WITH pts AS (SELECT p_brand,
        |               CAST(ROUND(p_retailprice*100,0) AS BIGINT) AS pc,
        |               p_size, COUNT(*) AS n_parts
        |             FROM part GROUP BY p_brand, pc, p_size)
        |SELECT p_brand, CAST(pc AS DOUBLE)/100.0 AS price, p_size, n_parts
        |FROM pts p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts o
        |  WHERE o.p_brand = p.p_brand AND o.pc <= p.pc AND o.p_size >= p.p_size
        |    AND (o.pc < p.pc OR o.p_size > p.p_size))
        |ORDER BY p_brand, price""".stripMargin,
    // Seasonal-naive backtest: lag over (nation, iso weekday) = Spark's
    // weekday() partition; exact integer cents, truncating division on
    // both engines (DuckDB // truncates toward zero like Spark div).
    "q147_seasonal_forecast" ->
      s"""WITH dim AS (SELECT s_suppkey, n_name
         |            FROM supplier JOIN nation ON s_nationkey = n_nationkey),
         |daily AS (SELECT n_name, CAST(l_shipdate AS DATE) AS d,
         |                 CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) AS c
         |          FROM lineitem JOIN dim ON l_suppkey = s_suppkey
         |          GROUP BY n_name, d),
         |f AS (SELECT n_name, c,
         |             LAG(c, 1) OVER (PARTITION BY n_name, isodow(d) ORDER BY d) AS forecast
         |      FROM daily)
         |SELECT n_name, COUNT(*) AS n_forecasts,
         |       CAST(SUM(ABS(c - forecast)) // COUNT(*) AS BIGINT) AS mae_cents,
         |       CAST(SUM(c - forecast) // COUNT(*) AS BIGINT) AS bias_cents
         |FROM f WHERE forecast IS NOT NULL
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // Closed-form 2-feature OLS from exact integer moments; one floor
    // per milli coefficient, R² from the same moments (HUGEINT mirror
    // of the engine's decimal(38) arithmetic).
    "q148_supplier_ols" ->
      s"""WITH li AS (SELECT l_suppkey, CAST(l_quantity AS BIGINT) AS x1,
         |                  CAST(ROUND(l_discount*10000,0) AS BIGINT) AS x2,
         |                  ${cents("l_extendedprice")} AS y
         |           FROM lineitem),
         |g AS (SELECT l_suppkey, COUNT(*) AS n,
         |             CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
         |             CAST(SUM(y) AS BIGINT) AS sy,
         |             CAST(SUM(x1*x1) AS BIGINT) AS s11,
         |             CAST(SUM(x1*x2) AS BIGINT) AS s12,
         |             CAST(SUM(x2*x2) AS BIGINT) AS s22,
         |             CAST(SUM(x1*y) AS BIGINT) AS s1y,
         |             CAST(SUM(x2*y) AS BIGINT) AS s2y,
         |             SUM(CAST(y AS HUGEINT)*y) AS syy
         |      FROM li GROUP BY l_suppkey),
         |m AS (SELECT l_suppkey, n,
         |             CAST(n AS HUGEINT)*s11 - CAST(s1 AS HUGEINT)*s1 AS ca,
         |             CAST(n AS HUGEINT)*s12 - CAST(s1 AS HUGEINT)*s2 AS cb,
         |             CAST(n AS HUGEINT)*s22 - CAST(s2 AS HUGEINT)*s2 AS cc,
         |             CAST(n AS HUGEINT)*s1y - CAST(s1 AS HUGEINT)*sy AS cd,
         |             CAST(n AS HUGEINT)*s2y - CAST(s2 AS HUGEINT)*sy AS ce,
         |             CAST(n AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy AS sst
         |      FROM g),
         |s AS (SELECT l_suppkey, n, cd, ce, sst,
         |             (cc*cd - cb*ce) * 1000 // (ca*cc - cb*cb) AS b1,
         |             (ca*ce - cb*cd) * 1000 // (ca*cc - cb*cb) AS b2
         |      FROM m WHERE ca*cc - cb*cb > 0 AND sst > 0)
         |SELECT l_suppkey, CAST(n AS INT) AS n_lines,
         |       CAST(b1 AS BIGINT) AS qty_slope_milli,
         |       CAST(b2 AS BIGINT) AS discount_slope_milli,
         |       CAST((cd*b1 + ce*b2) * 1000 // sst AS BIGINT) AS r2_ppm
         |FROM s ORDER BY l_suppkey""".stripMargin,
    // One-pass equi-width histogram quantile sketch: 256 cells, rank
    // ⌊p·(n−1)⌋, deterministic within-cell interpolation — every number
    // an exact integer on both engines.
    "q156_value_sketch" ->
      s"""WITH v AS (SELECT ${cents("o_totalprice")} AS v FROM orders
         |           WHERE o_totalprice IS NOT NULL),
         |st AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax, COUNT(*) AS n FROM v),
         |cells AS (SELECT ((v - vmin) * 256) // (vmax - vmin + 1) AS cell,
         |                 COUNT(*) AS cnt
         |          FROM v CROSS JOIN st GROUP BY cell),
         |cum AS (SELECT cell, cnt,
         |               COALESCE(SUM(cnt) OVER (ORDER BY cell
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
         |        FROM cells),
         |probs AS (SELECT CAST(unnest([250000, 500000, 900000, 990000]) AS BIGINT) AS prob_ppm),
         |j AS (SELECT prob_ppm, cell, cnt, cum_excl, vmin, vmax, n,
         |             (prob_ppm * (n - 1)) // 1000000 AS rk
         |      FROM cum CROSS JOIN st CROSS JOIN probs),
         |hit AS (SELECT * FROM j WHERE cum_excl <= rk AND rk < cum_excl + cnt),
         |o AS (SELECT prob_ppm,
         |             vmin + (cell * (vmax - vmin + 1)) // 256 AS cell_lo,
         |             vmin + ((cell + 1) * (vmax - vmin + 1)) // 256 - 1 AS cell_hi,
         |             cnt AS cell_count, n, rk, cum_excl
         |      FROM hit)
         |SELECT prob_ppm, cell_lo, cell_hi,
         |       CAST(cell_count AS BIGINT) AS cell_count, n,
         |       CAST(cell_lo + ((rk - cum_excl) * GREATEST(cell_hi - cell_lo, 0)) // cell_count
         |            AS BIGINT) AS estimate
         |FROM o ORDER BY prob_ppm""".stripMargin,
    // Grouped histogram sketch: shared global grid, per-group cumulative
    // counts, same exact integer interpolation.
    "q157_priority_sketch" ->
      s"""WITH v AS (SELECT o_orderpriority AS g, ${cents("o_totalprice")} AS v
         |           FROM orders WHERE o_totalprice IS NOT NULL),
         |st AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax FROM v),
         |cells AS (SELECT g, ((v - vmin) * 256) // (vmax - vmin + 1) AS cell,
         |                 COUNT(*) AS cnt
         |          FROM v CROSS JOIN st GROUP BY g, cell),
         |cum AS (SELECT g, cell, cnt,
         |               COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY cell
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl,
         |               SUM(cnt) OVER (PARTITION BY g) AS n
         |        FROM cells),
         |probs AS (SELECT CAST(unnest([250000, 500000, 900000, 990000]) AS BIGINT) AS prob_ppm),
         |j AS (SELECT g, prob_ppm, cell, cnt, cum_excl, n, vmin, vmax,
         |             (prob_ppm * (n - 1)) // 1000000 AS rk
         |      FROM cum CROSS JOIN st CROSS JOIN probs),
         |hit AS (SELECT * FROM j WHERE cum_excl <= rk AND rk < cum_excl + cnt),
         |o AS (SELECT g, prob_ppm,
         |             vmin + (cell * (vmax - vmin + 1)) // 256 AS cell_lo,
         |             vmin + ((cell + 1) * (vmax - vmin + 1)) // 256 - 1 AS cell_hi,
         |             cnt AS cell_count, CAST(n AS BIGINT) AS n, rk, cum_excl
         |      FROM hit)
         |SELECT g AS o_orderpriority, prob_ppm, cell_lo, cell_hi,
         |       CAST(cell_count AS BIGINT) AS cell_count, n,
         |       CAST(cell_lo + ((rk - cum_excl) * GREATEST(cell_hi - cell_lo, 0)) // cell_count
         |            AS BIGINT) AS estimate
         |FROM o ORDER BY o_orderpriority, prob_ppm""".stripMargin,
    // Quantity-weighted lower median price per supplier: collapsed
    // (supplier, price) weights, cumulative window, smallest price whose
    // doubled cumulative weight reaches the total.
    "q158_weighted_median" ->
      s"""WITH pw AS (SELECT l_suppkey, ${cents("l_extendedprice")} AS price_c,
         |                   CAST(SUM(${cents("l_quantity")}) AS BIGINT) AS w
         |            FROM lineitem GROUP BY l_suppkey, price_c),
         |c AS (SELECT l_suppkey, price_c, w,
         |             SUM(w) OVER (PARTITION BY l_suppkey ORDER BY price_c
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |             SUM(w) OVER (PARTITION BY l_suppkey) AS tot
         |      FROM pw)
         |SELECT l_suppkey, CAST(MAX(tot) AS BIGINT) AS total_weight,
         |       CAST(MIN(CASE WHEN cum * 2 >= tot THEN price_c END) AS DOUBLE)/100.0
         |         AS weighted_median_price
         |FROM c GROUP BY l_suppkey
         |ORDER BY l_suppkey""".stripMargin,
    // Modal order priority per segment. The engine carries the argmax
    // through partial aggregation as min(struct(-n, priority)); the
    // oracle deliberately states the rank-window form instead, so the
    // comparison checks the tie rule (smallest priority wins), not the
    // implementation.
    "q159_modal_priority" ->
      """WITH c AS (SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
        |           FROM orders JOIN customer ON o_custkey = c_custkey
        |           GROUP BY c_mktsegment, o_orderpriority),
        |r AS (SELECT c_mktsegment, o_orderpriority, n,
        |             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |               ORDER BY n DESC, o_orderpriority) AS rn,
        |             SUM(n) OVER (PARTITION BY c_mktsegment) AS n_orders
        |      FROM c)
        |SELECT c_mktsegment, o_orderpriority AS top_priority,
        |       CAST(n AS BIGINT) AS n_top, CAST(n_orders AS BIGINT) AS n_orders,
        |       CAST((n * 10000) // n_orders AS INT) AS share_bp
        |FROM r WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin,
    // Clamped running balance via the prefix-sum/running-floor
    // linearization: balance = S − min(0, min S); a clamp fires iff the
    // prefix sum digs a new low.
    "q163_clamped_balance" ->
      s"""WITH mv AS (SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
         |              CASE WHEN l_returnflag = 'R' THEN -${cents("l_quantity")}
         |                   ELSE ${cents("l_quantity")} END AS delta
         |            FROM lineitem),
         |s AS (SELECT *, SUM(delta) OVER wk AS ps FROM mv
         |      WINDOW wk AS (PARTITION BY l_suppkey
         |        ORDER BY l_shipdate, l_orderkey, l_linenumber
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |b AS (SELECT *, ps - LEAST(0, MIN(ps) OVER wk) AS balance,
         |             CASE WHEN ps < LEAST(0, COALESCE(MIN(ps) OVER wp, 0))
         |                  THEN 1 ELSE 0 END AS clamped
         |      FROM s
         |      WINDOW wk AS (PARTITION BY l_suppkey
         |        ORDER BY l_shipdate, l_orderkey, l_linenumber
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |      wp AS (PARTITION BY l_suppkey
         |        ORDER BY l_shipdate, l_orderkey, l_linenumber
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         |SELECT l_suppkey, COUNT(*) AS n_moves,
         |       CAST(SUM(delta) AS BIGINT) AS net_delta,
         |       CAST(SUM(delta) - LEAST(0, MIN(ps)) AS BIGINT) AS final_balance,
         |       CAST(MAX(balance) AS BIGINT) AS peak_balance,
         |       CAST(SUM(clamped) AS BIGINT) AS n_clamps
         |FROM b GROUP BY l_suppkey
         |ORDER BY l_suppkey""".stripMargin,
    // Rolling lower-median / MAD over a bounded ROWS frame: list() is
    // frame-ordered on both engines, medians are sorted-array elements,
    // everything integer cents.
    "q190_revenue_anomaly" ->
      s"""WITH d AS (SELECT o_orderpriority AS priority,
         |                  CAST(o_orderdate AS DATE) AS day,
         |                  CAST(SUM(${cents("o_totalprice")}) AS BIGINT) AS px
         |           FROM orders GROUP BY 1, 2),
         |a AS (SELECT *, list(px) OVER (PARTITION BY priority ORDER BY day
         |        ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) AS arr FROM d),
         |m AS (SELECT priority, day, px, len(arr) AS n, arr,
         |             list_sort(arr)[(len(arr)+1)//2] AS med
         |      FROM a),
         |m2 AS (SELECT priority, day, px, n, med,
         |              list_sort(list_transform(arr, v -> abs(v - med)))[(n+1)//2]
         |                AS mad
         |       FROM m)
         |SELECT priority, day, CAST(n AS INT) AS n_window, px, med, mad,
         |       CASE WHEN abs(px - med) > 5*mad THEN 1 ELSE 0 END AS is_anomaly
         |FROM m2 WHERE n >= 7
         |ORDER BY priority, day""".stripMargin,
    // SCD2 run collapse: lag change flag -> running-sum run ids -> one
    // aggregation per run -> lead closes each range.
    "q194_scd2_runs" ->
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
        |                  o_orderkey, o_orderpriority AS priority FROM orders),
        |r AS (SELECT *, CASE WHEN lag(priority) OVER w IS NULL
        |                       OR priority <> lag(priority) OVER w
        |                     THEN 1 ELSE 0 END AS chg
        |      FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey)),
        |v AS (SELECT *, CAST(SUM(chg) OVER (PARTITION BY o_custkey
        |        ORDER BY d, o_orderkey ROWS UNBOUNDED PRECEDING) AS INT) AS version
        |      FROM r),
        |g AS (SELECT o_custkey, version, priority, min(d) AS valid_from,
        |             COUNT(*) AS n_orders
        |      FROM v GROUP BY 1, 2, 3),
        |f AS (SELECT *, lead(valid_from) OVER (PARTITION BY o_custkey
        |        ORDER BY version) AS valid_to FROM g)
        |SELECT o_custkey, version, priority, valid_from, valid_to,
        |       CAST(n_orders AS BIGINT) AS n_orders,
        |       CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM f ORDER BY o_custkey, version""".stripMargin,
    // A-priori level-3: item-support prune, then the bounded in-basket
    // triple enumeration; top-k under a total tie-break order.
    "q195_frequent_triples" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS oid, l_partkey AS item
        |            FROM lineitem),
        |f1 AS (SELECT item FROM it GROUP BY item HAVING COUNT(*) >= 2),
        |p AS (SELECT * FROM it WHERE item IN (SELECT item FROM f1)),
        |t AS (SELECT a.i1, b.i2, c.i3, COUNT(*) AS support
        |      FROM (SELECT oid, item AS i1 FROM p) a
        |      JOIN (SELECT oid, item AS i2 FROM p) b USING (oid)
        |      JOIN (SELECT oid, item AS i3 FROM p) c USING (oid)
        |      WHERE a.i1 < b.i2 AND b.i2 < c.i3
        |      GROUP BY 1, 2, 3),
        |top AS (SELECT * FROM t ORDER BY support DESC, i1, i2, i3 LIMIT 25)
        |SELECT CAST(row_number() OVER (ORDER BY support DESC, i1, i2, i3) AS INT)
        |         AS rank,
        |       i1, i2, i3, CAST(support AS BIGINT) AS support
        |FROM top
        |ORDER BY rank""".stripMargin,

    "q197_gini_segment" ->
      """WITH rev AS (SELECT o_custkey,
        |               SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS cents
        |             FROM orders GROUP BY 1),
        |j AS (SELECT c_mktsegment, o_custkey, cents
        |      FROM rev JOIN customer ON o_custkey = c_custkey),
        |r AS (SELECT c_mktsegment, cents,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY cents, o_custkey) AS rk
        |      FROM j),
        |g AS (SELECT c_mktsegment, COUNT(*) AS n,
        |        SUM(CAST(cents AS HUGEINT)) AS s,
        |        SUM(CAST(rk AS HUGEINT) * cents) AS t
        |      FROM r GROUP BY 1)
        |SELECT c_mktsegment, CAST(n AS INT) AS n_cust,
        |       CAST(s AS DOUBLE)/100.0 AS revenue,
        |       CAST((2*t - (n+1)*s) * 1000000 // (n*s) AS BIGINT) AS gini_ppm,
        |       CAST(CAST((2*t - (n+1)*s) * 1000000 // (n*s) AS BIGINT)
        |            AS DOUBLE)/1e6 AS gini
        |FROM g ORDER BY c_mktsegment""".stripMargin,

    "q198_benford_prices" ->
      """WITH d AS (SELECT CAST(substring(CAST(CAST(round(o_totalprice*100,0)
        |             AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |           FROM orders
        |           WHERE CAST(round(o_totalprice*100,0) AS BIGINT) > 0),
        |c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT SUM(CAST(n AS HUGEINT)) AS nt FROM c)
        |SELECT digit, CAST(n AS BIGINT) AS n_orders,
        |       CAST(CAST(n AS HUGEINT) * 1000000 // nt AS BIGINT) AS obs_ppm,
        |       CAST(round(log10(1.0 + 1.0/digit) * 1e6, 0) AS BIGINT)
        |         AS exp_ppm,
        |       CAST(CAST(n AS HUGEINT) * 1000000 // nt AS BIGINT)
        |         - CAST(round(log10(1.0 + 1.0/digit) * 1e6, 0) AS BIGINT)
        |         AS dev_ppm
        |FROM c, t ORDER BY digit""".stripMargin,

    "q199_robust_means" ->
      """WITH b AS (SELECT o_orderpriority, o_orderkey,
        |             CAST(round(o_totalprice*100,0) AS BIGINT) AS cents
        |           FROM orders),
        |r AS (SELECT o_orderpriority, cents,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |                           ORDER BY cents, o_orderkey) AS rk,
        |        COUNT(*) OVER (PARTITION BY o_orderpriority) AS n,
        |        COUNT(*) OVER (PARTITION BY o_orderpriority) // 20 AS k
        |      FROM b),
        |g AS (SELECT o_orderpriority, MAX(n) AS n, MAX(k) AS k,
        |        SUM(cents) AS s_all,
        |        SUM(CASE WHEN rk > k AND rk <= n - k THEN cents END) AS s_trim,
        |        SUM(CASE WHEN rk > k AND rk <= n - k THEN 1 ELSE 0 END)
        |          AS n_trim,
        |        MAX(CASE WHEN rk = k + 1 THEN cents END) AS lo,
        |        MAX(CASE WHEN rk = n - k THEN cents END) AS hi
        |      FROM r GROUP BY 1)
        |SELECT o_orderpriority, CAST(n AS INT) AS n_orders,
        |       CAST(k AS INT) AS k_trim,
        |       CAST(s_all AS DOUBLE)/100.0/n AS mean,
        |       CAST(s_trim AS DOUBLE)/100.0/n_trim AS trimmed_mean,
        |       CAST(s_trim + k*(lo + hi) AS DOUBLE)/100.0/n AS winsor_mean,
        |       CAST(lo AS DOUBLE)/100.0 AS lo_bound,
        |       CAST(hi AS DOUBLE)/100.0 AS hi_bound
        |FROM g ORDER BY o_orderpriority""".stripMargin,

    "q200_abc_pareto" ->
      """WITH pr AS (SELECT l_partkey,
        |              SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS rev
        |            FROM lineitem GROUP BY 1),
        |w AS (SELECT l_partkey, rev,
        |        COALESCE(SUM(CAST(rev AS HUGEINT)) OVER (
        |          ORDER BY rev DESC, l_partkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |          0) AS prior
        |      FROM pr),
        |t AS (SELECT SUM(CAST(rev AS HUGEINT)) AS total FROM pr),
        |c AS (SELECT CASE WHEN prior * 1000000 // total < 800000 THEN 'A'
        |               WHEN prior * 1000000 // total < 950000 THEN 'B'
        |               ELSE 'C' END AS abc_class, rev
        |      FROM w, t)
        |SELECT abc_class, CAST(COUNT(*) AS INT) AS n_parts,
        |       CAST(SUM(CAST(rev AS HUGEINT)) AS DOUBLE)/100.0 AS revenue,
        |       CAST(SUM(CAST(rev AS HUGEINT)) * 1000000 //
        |            (SELECT total FROM t) AS BIGINT) AS share_ppm
        |FROM c GROUP BY 1 ORDER BY abc_class""".stripMargin,

    // SCD2 runs (the q194 CTEs) joined point-in-time by lineitem ship
    // date: each fact matches the version interval covering it.
    "q201_point_in_time" ->
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
        |                  o_orderkey, o_orderpriority AS prio FROM orders),
        |r AS (SELECT *, CASE WHEN lag(prio) OVER w IS NULL
        |                       OR prio <> lag(prio) OVER w
        |                     THEN 1 ELSE 0 END AS chg
        |      FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey)),
        |v AS (SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
        |        ORDER BY d, o_orderkey ROWS UNBOUNDED PRECEDING) AS version
        |      FROM r),
        |g AS (SELECT o_custkey AS rc_custkey, version, prio,
        |             min(d) AS valid_from
        |      FROM v GROUP BY 1, 2, 3),
        |runs AS (SELECT rc_custkey, prio, valid_from,
        |           lead(valid_from) OVER (PARTITION BY rc_custkey
        |             ORDER BY version) AS valid_to FROM g),
        |f AS (SELECT l.l_orderkey, CAST(l.l_shipdate AS DATE) AS ship_d,
        |             oo.o_custkey, oo.o_orderpriority
        |      FROM lineitem l JOIN orders oo ON l.l_orderkey = oo.o_orderkey)
        |SELECT o_orderpriority AS order_priority, prio AS active_priority,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines,
        |       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |FROM f JOIN runs ON f.o_custkey = runs.rc_custkey
        |  AND f.ship_d >= runs.valid_from
        |  AND (runs.valid_to IS NULL OR f.ship_d < runs.valid_to)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q203_basket_rules" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS oid, l_partkey AS item
        |            FROM lineitem),
        |nn AS (SELECT COUNT(DISTINCT oid) AS n_orders FROM it),
        |isup AS (SELECT item, COUNT(*) AS s_i FROM it GROUP BY 1),
        |pr AS (SELECT a.item AS i1, b.item AS i2, COUNT(*) AS s_ab
        |       FROM it a JOIN it b ON a.oid = b.oid AND a.item < b.item
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |dirs AS (SELECT i1 AS antecedent, i2 AS consequent, s_ab FROM pr
        |         UNION ALL
        |         SELECT i2 AS antecedent, i1 AS consequent, s_ab FROM pr),
        |j AS (SELECT d.antecedent, d.consequent, d.s_ab,
        |        sa.s_i AS s_a, sc.s_i AS s_c, nn.n_orders
        |      FROM dirs d
        |      JOIN isup sa ON d.antecedent = sa.item
        |      JOIN isup sc ON d.consequent = sc.item, nn)
        |SELECT antecedent, consequent,
        |       CAST(s_ab AS BIGINT) AS pair_supp,
        |       CAST(s_a AS BIGINT) AS ante_supp,
        |       CAST(s_c AS BIGINT) AS cons_supp,
        |       CAST(s_ab * 1000000 // s_a AS BIGINT) AS conf_ppm,
        |       CAST(CAST(s_ab AS HUGEINT) * n_orders * 1000000 //
        |            (CAST(s_a AS HUGEINT) * s_c) AS BIGINT) AS lift_ppm
        |FROM j
        |ORDER BY lift_ppm DESC, antecedent, consequent
        |LIMIT 25""".stripMargin,

    // 10 PK + 7 FK legs; anti-join semantics via NOT EXISTS (a parent
    // with duplicate keys must not multiply the child count).
    "q207_constraint_audit" ->
      """WITH legs AS (
        |  SELECT 'pk_region' AS constraint_name, 'pk' AS kind,
        |    (SELECT COUNT(*) FROM region) AS n_rows,
        |    (SELECT COUNT(*) - COUNT(DISTINCT r_regionkey) FROM region)
        |      AS n_violations
        |  UNION ALL SELECT 'pk_nation', 'pk',
        |    (SELECT COUNT(*) FROM nation),
        |    (SELECT COUNT(*) - COUNT(DISTINCT n_nationkey) FROM nation)
        |  UNION ALL SELECT 'pk_customer', 'pk',
        |    (SELECT COUNT(*) FROM customer),
        |    (SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer)
        |  UNION ALL SELECT 'pk_supplier', 'pk',
        |    (SELECT COUNT(*) FROM supplier),
        |    (SELECT COUNT(*) - COUNT(DISTINCT s_suppkey) FROM supplier)
        |  UNION ALL SELECT 'pk_part', 'pk',
        |    (SELECT COUNT(*) FROM part),
        |    (SELECT COUNT(*) - COUNT(DISTINCT p_partkey) FROM part)
        |  UNION ALL SELECT 'pk_orders', 'pk',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
        |  UNION ALL SELECT 'pk_lineitem', 'pk',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
        |     FROM lineitem)
        |  UNION ALL SELECT 'pk_events', 'pk',
        |    (SELECT COUNT(*) FROM events),
        |    (SELECT COUNT(*) - COUNT(DISTINCT event_id) FROM events)
        |  UNION ALL SELECT 'pk_documents', 'pk',
        |    (SELECT COUNT(*) FROM documents),
        |    (SELECT COUNT(*) - COUNT(DISTINCT doc_id) FROM documents)
        |  UNION ALL SELECT 'pk_embeddings', 'pk',
        |    (SELECT COUNT(*) FROM embeddings),
        |    (SELECT COUNT(*) - COUNT(DISTINCT vec_id) FROM embeddings)
        |  UNION ALL SELECT 'fk_lineitem_orders', 'fk',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL SELECT 'fk_lineitem_part', 'fk',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |  UNION ALL SELECT 'fk_lineitem_supplier', 'fk',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        |  UNION ALL SELECT 'fk_orders_customer', 'fk',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL SELECT 'fk_customer_nation', 'fk',
        |    (SELECT COUNT(*) FROM customer),
        |    (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
        |      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
        |  UNION ALL SELECT 'fk_supplier_nation', 'fk',
        |    (SELECT COUNT(*) FROM supplier),
        |    (SELECT COUNT(*) FROM supplier s WHERE NOT EXISTS
        |      (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
        |  UNION ALL SELECT 'fk_nation_region', 'fk',
        |    (SELECT COUNT(*) FROM nation),
        |    (SELECT COUNT(*) FROM nation n WHERE NOT EXISTS
        |      (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)))
        |SELECT constraint_name, kind, CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(n_violations AS BIGINT) AS n_violations,
        |       CAST(n_violations * 1000000 // greatest(n_rows, 1) AS BIGINT)
        |         AS violation_ppm
        |FROM legs ORDER BY constraint_name""".stripMargin,

    // Flat recompute — the Spark side merges two partial-aggregate
    // states, so a green row proves the merge identity.
    "q209_incremental_agg" ->
      """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT))
        |            AS DOUBLE)/100.0 AS revenue,
        |       MAX(CAST(o_orderdate AS DATE)) AS last_order
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q210_k_anonymity" ->
      """SELECT c_mktsegment, c_nationkey,
        |       CAST(COUNT(*) AS BIGINT) AS class_size,
        |       CASE WHEN COUNT(*) >= 5 THEN 1 ELSE 0 END AS is_k_anonymous
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q211_rfm_segments" ->
      """WITH per AS (SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS lastd,
        |               COUNT(*) AS freq,
        |               SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS cents
        |             FROM orders GROUP BY 1),
        |a AS (SELECT MAX(lastd) AS anchor FROM per),
        |j AS (SELECT per.o_custkey, per.freq, per.cents, c.c_mktsegment,
        |        datediff('day', per.lastd, a.anchor) AS recency_days
        |      FROM per JOIN customer c ON per.o_custkey = c.c_custkey, a),
        |s AS (SELECT *,
        |        6 - ntile(5) OVER (PARTITION BY c_mktsegment
        |              ORDER BY recency_days, o_custkey) AS r,
        |        6 - ntile(5) OVER (PARTITION BY c_mktsegment
        |              ORDER BY freq DESC, o_custkey) AS f,
        |        6 - ntile(5) OVER (PARTITION BY c_mktsegment
        |              ORDER BY cents DESC, o_custkey) AS m
        |      FROM j)
        |SELECT o_custkey, c_mktsegment,
        |       CAST(recency_days AS BIGINT) AS recency_days,
        |       CAST(freq AS BIGINT) AS n_orders,
        |       CAST(cents AS DOUBLE)/100.0 AS revenue,
        |       CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
        |       CASE WHEN r >= 4 AND f >= 4 AND m >= 4 THEN 'champion'
        |            WHEN f >= 4 THEN 'loyal'
        |            WHEN m >= 4 THEN 'big_spender'
        |            WHEN r <= 2 AND f <= 2 THEN 'hibernating'
        |            WHEN r <= 2 THEN 'at_risk'
        |            ELSE 'regular' END AS segment
        |FROM s ORDER BY o_custkey""".stripMargin,

    // CUSUM linearized: S⁺_t = P_t − min(0, min_{j≤t} P_j) turns Page's
    // max(0, ·) recursion into two prefix windows; all integer cents.
    "q212_cusum_shift" ->
      s"""WITH d AS (SELECT o_orderpriority AS priority,
         |                  CAST(o_orderdate AS DATE) AS day,
         |                  CAST(SUM(${cents("o_totalprice")}) AS BIGINT) AS px
         |           FROM orders GROUP BY 1, 2),
         |m AS (SELECT priority, CAST(SUM(px) // COUNT(*) AS BIGINT) AS mu
         |      FROM d GROUP BY 1),
         |j AS (SELECT d.priority, d.day, d.px, m.mu,
         |             m.mu // 50 AS k, m.mu // 2 AS h
         |      FROM d JOIN m ON d.priority = m.priority),
         |p AS (SELECT *, CAST(SUM(px - mu - k) OVER w AS BIGINT) AS p_up,
         |               CAST(SUM(mu - px - k) OVER w AS BIGINT) AS p_dn
         |      FROM j WINDOW w AS (PARTITION BY priority ORDER BY day
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |s AS (SELECT *, p_up - least(0, MIN(p_up) OVER w) AS s_up,
         |               p_dn - least(0, MIN(p_dn) OVER w) AS s_dn
         |      FROM p WINDOW w AS (PARTITION BY priority ORDER BY day
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT priority, day, px, mu, s_up, s_dn,
         |       CASE WHEN s_up > h THEN 1 ELSE 0 END AS alarm_up,
         |       CASE WHEN s_dn > h THEN 1 ELSE 0 END AS alarm_dn
         |FROM s ORDER BY priority, day""".stripMargin,

    // Interpolation via the nonneg weighted-sum form so the floor
    // division never sees a negative numerator (engines disagree there).
    "q213_gap_fill" ->
      s"""WITH d AS (SELECT o_orderpriority AS priority,
         |                  CAST(o_orderdate AS DATE) AS day,
         |                  CAST(SUM(${cents("o_totalprice")}) AS BIGINT) AS px
         |           FROM orders GROUP BY 1, 2),
         |b AS (SELECT priority, MIN(day) AS d0, MAX(day) AS d1
         |      FROM d GROUP BY 1),
         |sp AS (SELECT priority,
         |         CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
         |           AS day
         |       FROM b),
         |j AS (SELECT sp.priority, sp.day, d.px
         |      FROM sp LEFT JOIN d ON d.priority = sp.priority
         |                         AND d.day = sp.day),
         |f AS (SELECT priority, day, px,
         |        last_value(px IGNORE NULLS) OVER wb AS prev_px,
         |        last_value(CASE WHEN px IS NOT NULL THEN day END IGNORE NULLS)
         |          OVER wb AS prev_d,
         |        first_value(px IGNORE NULLS) OVER wf AS next_px,
         |        first_value(CASE WHEN px IS NOT NULL THEN day END IGNORE NULLS)
         |          OVER wf AS next_d
         |      FROM j
         |      WINDOW wb AS (PARTITION BY priority ORDER BY day
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |             wf AS (PARTITION BY priority ORDER BY day
         |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT priority, day,
         |       CASE WHEN px IS NOT NULL THEN px
         |            ELSE (prev_px * date_diff('day', day, next_d)
         |                  + next_px * date_diff('day', prev_d, day))
         |                 // date_diff('day', prev_d, next_d) END AS px_filled,
         |       CASE WHEN px IS NOT NULL THEN 1 ELSE 0 END AS is_observed
         |FROM f ORDER BY priority, day""".stripMargin,

    // Spearman with DETERMINISTIC tie-break ranks (value, custkey) on
    // both axes, so the no-ties identity is exact on both engines; the
    // floor division's numerator is nonnegative by construction.
    "q215_spearman_segments" ->
      """WITH rev AS (SELECT o_custkey,
        |               SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS cents
        |             FROM orders GROUP BY 1),
        |j AS (SELECT c_mktsegment, o_custkey, CAST(cents AS BIGINT) AS cents,
        |             CAST(round(c_acctbal*100,0) AS BIGINT) AS bal
        |      FROM rev JOIN customer ON o_custkey = c_custkey),
        |r AS (SELECT c_mktsegment,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY bal, o_custkey) AS rx,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY cents, o_custkey) AS ry
        |      FROM j),
        |g AS (SELECT c_mktsegment, COUNT(*) AS n,
        |             SUM(CAST(rx - ry AS HUGEINT) * (rx - ry)) AS sd2
        |      FROM r GROUP BY 1 HAVING COUNT(*) > 1)
        |SELECT c_mktsegment, CAST(n AS INT) AS n_cust,
        |       CAST(sd2 AS BIGINT) AS sum_d2,
        |       CAST(1000000 - 6 * sd2 * 1000000
        |            // (CAST(n AS HUGEINT) * (n*n - 1)) AS BIGINT) AS rho_ppm,
        |       CAST(CAST(1000000 - 6 * sd2 * 1000000
        |            // (CAST(n AS HUGEINT) * (n*n - 1)) AS BIGINT) AS DOUBLE)/1e6
        |         AS rho
        |FROM g ORDER BY c_mktsegment""".stripMargin,

    // AprioriAll level 2: first-purchase collapse, support prune BEFORE
    // the per-customer ordered pair join, confidence in floor ppm.
    "q217_sequential_rules" ->
      """WITH f AS (SELECT o_custkey, l_partkey,
        |             MIN(CAST(o_orderdate AS DATE)) AS first_d
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |           GROUP BY 1, 2),
        |fr AS (SELECT l_partkey, COUNT(*) AS n_cust_part
        |       FROM f GROUP BY 1 HAVING COUNT(*) >= 5),
        |p AS (SELECT f.o_custkey, f.l_partkey, f.first_d, fr.n_cust_part
        |      FROM f JOIN fr ON f.l_partkey = fr.l_partkey),
        |pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |              COUNT(*) AS n_cust, MAX(a.n_cust_part) AS n_ante
        |       FROM p a JOIN p b ON a.o_custkey = b.o_custkey
        |                        AND a.first_d < b.first_d
        |       GROUP BY 1, 2)
        |SELECT part_a, part_b, CAST(n_cust AS BIGINT) AS n_cust,
        |       CAST(n_ante AS BIGINT) AS n_ante,
        |       CAST(n_cust * 1000000 // n_ante AS BIGINT) AS conf_ppm
        |FROM pr ORDER BY n_cust DESC, part_a, part_b
        |LIMIT 25""".stripMargin,

    // Product-limit survival in integer micro-nats: each ln factor
    // quantized once (the q181 contract); running risk/log-survival
    // restated as plain prefix windows (the Spark side rides PrefixSum).
    "q218_kaplan_meier" ->
      """WITH per AS (SELECT o_custkey,
        |               MIN(year(o_orderdate)*12 + month(o_orderdate)) AS m0,
        |               MAX(year(o_orderdate)*12 + month(o_orderdate)) AS m1
        |             FROM orders GROUP BY 1),
        |a AS (SELECT MAX(m1) AS mmax FROM per),
        |h AS (SELECT m1 - m0 AS t, COUNT(*) AS n_at_t,
        |             CAST(SUM(CASE WHEN m1 >= a.mmax - 3 THEN 0 ELSE 1 END)
        |               AS BIGINT) AS d
        |      FROM per, a GROUP BY 1, a.mmax),
        |r AS (SELECT *, CAST(SUM(n_at_t) OVER (ORDER BY t DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |        AS n_risk
        |      FROM h),
        |s AS (SELECT *, CAST(ROUND(ln(greatest(n_risk - d, 1)) * 1000000, 0)
        |          AS BIGINT)
        |        - CAST(ROUND(ln(n_risk) * 1000000, 0) AS BIGINT) AS term
        |      FROM r)
        |SELECT CAST(t AS INT) AS t_months, n_risk,
        |       CAST(n_at_t AS BIGINT) AS n_at_t, d AS n_churn,
        |       CAST(d * 1000000 // n_risk AS BIGINT) AS hazard_ppm,
        |       CAST(SUM(term) OVER (ORDER BY t
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS log_surv_micro
        |FROM s ORDER BY t_months""".stripMargin,

    // l-diversity: QI class = (mktsegment, nationkey), sensitive band =
    // acctbal tier; distinct-l + entropy-l (floor micro-nats) + the
    // 2-diverse flag.
    "q250_l_diversity" ->
      """WITH cells AS (SELECT c_mktsegment, c_nationkey,
        |         CASE WHEN c_acctbal < 0 THEN 'neg'
        |              WHEN c_acctbal <= 5000 THEN 'mid'
        |              ELSE 'high' END AS band,
        |         COUNT(*) AS ns
        |       FROM customer GROUP BY 1, 2, 3),
        |tt AS (SELECT c_mktsegment, c_nationkey,
        |         CAST(SUM(ns) AS BIGINT) AS class_size
        |       FROM cells GROUP BY 1, 2),
        |tm AS (SELECT cells.c_mktsegment, cells.c_nationkey, ns, class_size,
        |         ns * CAST(round(ln(CAST(ns AS DOUBLE) / class_size) * 1e6, 0)
        |              AS BIGINT) AS term
        |       FROM cells JOIN tt USING (c_mktsegment, c_nationkey)),
        |ag AS (SELECT c_mktsegment, c_nationkey,
        |         MAX(class_size) AS class_size,
        |         CAST(COUNT(*) AS INT) AS distinct_l,
        |         CAST((-SUM(term)) // MAX(class_size) AS BIGINT)
        |           AS entropy_micro
        |       FROM tm GROUP BY 1, 2)
        |SELECT c_mktsegment, c_nationkey,
        |       CAST(class_size AS BIGINT) AS class_size, distinct_l,
        |       entropy_micro,
        |       CAST(CASE WHEN distinct_l >= 2 AND entropy_micro >= 693147
        |            THEN 1 ELSE 0 END AS INT) AS is_2_diverse
        |FROM ag
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    // Temporal-holdout recommender eval: pre-pivot top-3 co-purchase
    // recs, post-pivot baskets, hit-rate@k with cold-start reported.
    "q258_rec_holdout" ->
      """WITH ito AS (SELECT o_orderkey AS oid,
        |         CASE WHEN o_orderdate >= DATE '1997-01-01' THEN 1 ELSE 0 END
        |           AS is_test
        |       FROM orders),
        |li AS (SELECT DISTINCT l_orderkey AS oid, l_partkey AS item
        |       FROM lineitem),
        |itx AS (SELECT li.oid, li.item, ito.is_test FROM li JOIN ito USING (oid)),
        |tr AS (SELECT oid, item FROM itx WHERE is_test = 0),
        |te AS (SELECT oid, item FROM itx WHERE is_test = 1),
        |pc AS (SELECT a.item, b.item AS other, COUNT(*) AS cnt
        |       FROM tr a JOIN tr b ON a.oid = b.oid AND a.item <> b.item
        |       GROUP BY 1, 2),
        |rc AS (SELECT item, other, rnk FROM (
        |    SELECT *, row_number() OVER (PARTITION BY item
        |      ORDER BY cnt DESC, other) AS rnk FROM pc) z
        |  WHERE rnk <= 3),
        |sn AS (SELECT DISTINCT item FROM rc),
        |eb AS (SELECT te.oid, te.item FROM te JOIN sn USING (item)),
        |ne AS (SELECT COUNT(*) AS n_evals FROM eb),
        |ncold AS (SELECT COUNT(*) AS n_cold FROM te
        |          LEFT JOIN sn ON sn.item = te.item WHERE sn.item IS NULL),
        |mt AS (SELECT eb.oid, eb.item, MIN(rc.rnk) AS min_rank
        |       FROM eb JOIN rc USING (item)
        |       JOIN te t2 ON t2.oid = eb.oid AND t2.item = rc.other
        |       GROUP BY 1, 2),
        |ha AS (SELECT
        |    COALESCE(SUM(CASE WHEN min_rank <= 1 THEN 1 ELSE 0 END), 0) AS h1,
        |    COALESCE(SUM(CASE WHEN min_rank <= 2 THEN 1 ELSE 0 END), 0) AS h2,
        |    COALESCE(SUM(CASE WHEN min_rank <= 3 THEN 1 ELSE 0 END), 0) AS h3
        |  FROM mt),
        |ks AS (SELECT CAST(unnest([1, 2, 3]) AS INT) AS k),
        |kh AS (SELECT ks.k,
        |         CASE ks.k WHEN 1 THEN h1 WHEN 2 THEN h2 ELSE h3 END AS nh
        |       FROM ks CROSS JOIN ha)
        |SELECT kh.k, CAST(ne.n_evals AS BIGINT) AS n_evals,
        |       CAST(ncold.n_cold AS BIGINT) AS n_cold,
        |       CAST(kh.nh AS BIGINT) AS n_hits,
        |       CAST(CASE WHEN ne.n_evals = 0 THEN 0
        |            ELSE kh.nh * 1000000 // ne.n_evals END AS BIGINT)
        |         AS hitrate_ppm,
        |       CAST(CASE WHEN ne.n_evals > 1 THEN ROUND(SQRT(
        |              CAST(CAST(ne.n_evals AS HUGEINT) * kh.nh
        |                   - CAST(kh.nh AS HUGEINT) * kh.nh AS DOUBLE) /
        |              CAST(CAST(ne.n_evals AS HUGEINT) * ne.n_evals
        |                   * (ne.n_evals - 1) AS DOUBLE)) * 1000000, 0)
        |            ELSE 0 END AS BIGINT) AS hit_se_ppm
        |FROM kh CROSS JOIN ne CROSS JOIN ncold
        |ORDER BY kh.k""".stripMargin,

    // t-closeness: ordered-EMD between each QI class's sensitive-band
    // distribution and the global one, exact cross-multiplied integers.
    "q265_t_closeness" ->
      """WITH cells AS (SELECT c_mktsegment, c_nationkey,
        |    CASE WHEN c_acctbal < 0 THEN 1
        |         WHEN c_acctbal <= 5000 THEN 2 ELSE 3 END AS band,
        |    COUNT(*) AS ns
        |  FROM customer GROUP BY 1, 2, 3),
        |tot AS (SELECT c_mktsegment, c_nationkey, SUM(ns) AS class_size
        |        FROM cells GROUP BY 1, 2),
        |gl AS (SELECT b.band, COALESCE(g.gs, 0) AS gs
        |       FROM (SELECT UNNEST([1, 2, 3]) AS band) b
        |       LEFT JOIN (SELECT band, SUM(ns) AS gs FROM cells
        |                  GROUP BY band) g USING (band)),
        |nt AS (SELECT SUM(ns) AS n_total FROM cells),
        |spine AS (SELECT t.c_mktsegment, t.c_nationkey, t.class_size,
        |            b.band
        |          FROM tot t CROSS JOIN
        |            (SELECT UNNEST([1, 2, 3]) AS band) b),
        |filled AS (SELECT s.c_mktsegment, s.c_nationkey, s.band,
        |             s.class_size,
        |             CAST(COALESCE(c.ns, 0) AS HUGEINT) * nt.n_total
        |               - CAST(gl.gs AS HUGEINT) * s.class_size AS dnum,
        |             CAST(s.class_size AS HUGEINT) * nt.n_total AS den
        |           FROM spine s
        |           LEFT JOIN cells c
        |             USING (c_mktsegment, c_nationkey, band)
        |           JOIN gl USING (band) CROSS JOIN nt),
        |cm AS (SELECT *, SUM(dnum) OVER (
        |           PARTITION BY c_mktsegment, c_nationkey ORDER BY band
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS cum
        |       FROM filled)
        |SELECT c_mktsegment, c_nationkey,
        |       CAST(MAX(class_size) AS BIGINT) AS class_size,
        |       CAST(SUM(ABS(cum)) * 1000000 // (2 * MAX(den)) AS BIGINT)
        |         AS emd_ppm,
        |       CAST(CASE WHEN SUM(ABS(cum)) * 1000000 // (2 * MAX(den))
        |              <= 200000 THEN 1 ELSE 0 END AS INT) AS is_t_close
        |FROM cm WHERE band < 3
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
  )
}
