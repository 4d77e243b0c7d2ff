package graft.oracle

import graft.oracle.OracleDialect._

/** DuckDB oracle SQL — core tier
  * (47 queries). Values are verbatim from SparkEntry.scala
  * (round-11 mechanical split); SparkEntry.oracleSql concatenates the
  * domain maps, and QueriesSpec pins key-set equality (both directions) with the
  * query registry. */
object OracleCore {
  private[graft] val sql: Map[String, String] = Map(
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
         |         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
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
        |       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       MIN(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |       MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q41_session_window" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, ts, value,
         |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
         |              THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (
         |  SELECT user_id, ts, value,
         |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM flagged)
         |SELECT CAST(MIN(ts) AS TIMESTAMP) AS session_start,
         |       CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
         |       user_id, COUNT(*) AS n_events,
         |       ${moneySum("value")} AS sum_value
         |FROM sess
         |GROUP BY user_id, session_id
         |ORDER BY user_id, session_start""".stripMargin,
    // Oracled against the ORIGINAL parquet table, not the CSV files: the
    // operator's contract is a lossless write→parse→typed-scan round
    // trip, and reading the source table keeps the gate independent of
    // when the fixed drop directory is rewritten at another scale factor
    // (e.g. a bench run between Verify and the DuckDB compare).
    "q48_csv_roundtrip" ->
      s"""SELECT c_custkey, c_name, c_acctbal, c_mktsegment
         |FROM customer
         |ORDER BY c_custkey""".stripMargin,
    // Lossless-round-trip invariant against the ORIGINAL table (same
    // rationale as q48).
    "q51_json_roundtrip" ->
      s"""SELECT doc_id, text, lang, source, n_chars
         |FROM documents
         |ORDER BY doc_id""".stripMargin,
    "q66_orc_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q73_event_funnel" ->
      s"""WITH v AS (SELECT user_id, MIN(ts) AS tv FROM events
         |           WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, MIN(e.ts) AS tc
         |      FROM events e JOIN v ON e.user_id = v.user_id
         |      WHERE e.event_type = 'click' AND e.ts > v.tv
         |      GROUP BY e.user_id),
         |p AS (SELECT e.user_id, MIN(e.ts) AS tp
         |      FROM events e JOIN c ON e.user_id = c.user_id
         |      WHERE e.event_type = 'purchase' AND e.ts > c.tc
         |      GROUP BY e.user_id)
         |SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
         |UNION ALL SELECT '2_click', COUNT(*) FROM c
         |UNION ALL SELECT '3_purchase', COUNT(*) FROM p
         |ORDER BY stage""".stripMargin,
    "q74_cohort_retention" ->
      s"""WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
         |coh AS (SELECT user_id, MIN(d) AS cohort_day FROM act GROUP BY user_id)
         |SELECT c.cohort_day,
         |       date_diff('day', c.cohort_day, a.d) AS day_offset,
         |       COUNT(DISTINCT a.user_id) AS n_users
         |FROM act a JOIN coh c ON a.user_id = c.user_id
         |WHERE date_diff('day', c.cohort_day, a.d) <= 7
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,
    // Lag ordering compares microsecond epochs on both sides (Spark's ts
    // is already micros; epoch_us truncates DuckDB's TIMESTAMP_NS the
    // same way), tie-broken by unique event_id. Probabilities use the
    // fixed-point floor-division idiom (q90/q101) — all-integer, no
    // rounding tie possible.
    "q102_event_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS from_type
        |  FROM events),
        |pairs AS (
        |  SELECT from_type, event_type AS to_type, COUNT(*) AS n
        |  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |tots AS (
        |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
        |  FROM pairs GROUP BY from_type)
        |SELECT pr.from_type, pr.to_type, pr.n,
        |       CAST((pr.n * 1000000) // t.tot AS DOUBLE)/1000000.0 AS p
        |FROM pairs pr JOIN tots t ON pr.from_type = t.from_type
        |ORDER BY pr.from_type, pr.to_type""".stripMargin,
    // First-view/first-subsequent-purchase epochs are exact integer
    // micros on both engines; latency is floor-divided to whole seconds
    // BEFORE the percentiles, so quantile_cont interpolates the same
    // integer set as Spark's type-7 `percentile`.
    "q103_conversion_latency" ->
      """WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS uv FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |p AS (SELECT e.user_id, v.uv, MIN(epoch_us(e.ts)) AS up
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.uv
        |      GROUP BY e.user_id, v.uv),
        |lat AS (SELECT (up - uv) // 1000000 AS latency_sec FROM p)
        |SELECT COUNT(*) AS n_converted,
        |       ROUND(quantile_cont(latency_sec, 0.5), 4) AS p50_sec,
        |       ROUND(quantile_cont(latency_sec, 0.9), 4) AS p90_sec,
        |       MAX(latency_sec) AS max_sec
        |FROM lat""".stripMargin,
    // q26's session assignment verbatim (strict > gap on micros), then
    // per-session paths via ordered string_agg — the same (micros,
    // event_id) order as Spark's struct sort.
    "q120_session_paths" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sess AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         SUM(new_session) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged),
        |paths AS (
        |  SELECT user_id, session_id,
        |         string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id) AS path
        |  FROM sess GROUP BY user_id, session_id),
        |pc AS (SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path)
        |SELECT CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS INT) AS rank,
        |       path, n_sessions
        |FROM pc
        |ORDER BY n_sessions DESC, path
        |LIMIT 10""".stripMargin,
    // TPC-H Q17 correlation: qty below 20% of the part's own average,
    // exact integer form 5*qty*cnt < sum_qty over cents.
    "q132_small_qty_revenue" ->
      s"""WITH li AS (
         |  SELECT l_partkey, ${cents("l_quantity")} AS qc,
         |         ${cents("l_extendedprice")} AS c
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand = 'Brand#12'),
         |pp AS (SELECT l_partkey, CAST(SUM(qc) AS BIGINT) AS sum_qc,
         |              COUNT(*) AS cnt
         |       FROM li GROUP BY l_partkey)
         |SELECT COUNT(*) AS n_small_qty_items,
         |       CAST(SUM(li.c) AS DOUBLE)/100.0 AS revenue
         |FROM li JOIN pp ON li.l_partkey = pp.l_partkey
         |WHERE li.qc * pp.cnt * 5 < pp.sum_qc""".stripMargin,
    // TPC-H Q18 HAVING shape: orders over 300 total qty, customer join
    // after the group-filter.
    "q133_large_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, CAST(SUM(${cents("l_quantity")}) AS BIGINT) AS qty_cents
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING SUM(${cents("l_quantity")}) > 30000)
         |SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
         |       o_totalprice, CAST(qty_cents AS DOUBLE)/100.0 AS total_qty
         |FROM big JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey
         |LIMIT 100""".stripMargin,
    // TPC-H Q22 shape: above-average positive balance, no order since the
    // cutoff; bal*n > sum is the exact integer form of bal > avg.
    "q134_idle_rich_customers" ->
      s"""WITH cu AS (SELECT c_custkey, c_nationkey, ${cents("c_acctbal")} AS bc
         |            FROM customer),
         |pa AS (SELECT CAST(SUM(bc) AS BIGINT) AS sum_pos, COUNT(*) AS n_pos
         |       FROM cu WHERE bc > 0)
         |SELECT c_nationkey, COUNT(*) AS n_customers,
         |       CAST(SUM(bc) AS DOUBLE)/100.0 AS total_acctbal
         |FROM cu CROSS JOIN pa
         |WHERE bc * n_pos > sum_pos
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |                  WHERE o_custkey = c_custkey
         |                    AND o_orderdate >= TIMESTAMP '2001-01-01')
         |GROUP BY c_nationkey
         |ORDER BY c_nationkey""".stripMargin,
    // TPC-H Q2 min-subquery shape: per part the cheapest supplier, ties
    // to the lowest suppkey (row_number mirrors the struct-min argmin).
    "q135_min_cost_supplier" ->
      s"""WITH cost AS (
         |  SELECT l_partkey, l_suppkey, CAST(MIN(${cents("l_extendedprice")}) AS BIGINT) AS mc
         |  FROM lineitem GROUP BY l_partkey, l_suppkey),
         |best AS (
         |  SELECT l_partkey, l_suppkey, mc,
         |         ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY mc, l_suppkey) AS rn
         |  FROM cost)
         |SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey, s_name, n_name,
         |       CAST(mc AS DOUBLE)/100.0 AS best_price
         |FROM best JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE rn = 1
         |ORDER BY best_price DESC, p_partkey
         |LIMIT 50""".stripMargin,
    // TPC-H Q14 CASE-share shape: monthly PROMO revenue share in exact
    // integer basis points (floor division on both engines).
    "q136_promo_share" ->
      s"""WITH li AS (
         |  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         |         ${cents("l_extendedprice")} AS c,
         |         CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |m AS (SELECT month,
         |             CAST(SUM(CASE WHEN is_promo = 1 THEN c ELSE 0 END) AS BIGINT) AS pc,
         |             CAST(SUM(c) AS BIGINT) AS tc
         |      FROM li GROUP BY month)
         |SELECT month, CAST(pc AS DOUBLE)/100.0 AS promo_revenue,
         |       CAST(tc AS DOUBLE)/100.0 AS total_revenue,
         |       CAST((pc * 10000) // tc AS INT) AS promo_share_bp
         |FROM m ORDER BY month""".stripMargin,
    // TPC-H Q15 view-max shape: suppliers achieving the quarter's maximum
    // revenue (ties survive).
    "q137_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) AS rc
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate <  TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, CAST(rc AS DOUBLE)/100.0 AS total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE rc = (SELECT MAX(rc) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    // Chi-square contingency over the FULL zero-filled grid; one floor
    // division of exact integers per cell (HUGEINT ≡ Spark decimal(38)).
    "q145_event_chi_square" ->
      """WITH cells AS (SELECT event_type, user_id % 4 AS cohort, COUNT(*) AS obs
        |               FROM events GROUP BY event_type, cohort),
        |r AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS row_n FROM cells GROUP BY event_type),
        |c AS (SELECT cohort, CAST(SUM(obs) AS BIGINT) AS col_n FROM cells GROUP BY cohort),
        |t AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells),
        |g AS (SELECT r.event_type, c.cohort, r.row_n, c.col_n, t.n
        |      FROM r CROSS JOIN c CROSS JOIN t),
        |j AS (SELECT g.event_type, g.cohort, g.row_n, g.col_n, g.n,
        |             COALESCE(cells.obs, 0) AS obs
        |      FROM g LEFT JOIN cells ON g.event_type = cells.event_type
        |                            AND g.cohort = cells.cohort)
        |SELECT event_type, cohort, obs,
        |       CAST(CAST(row_n AS HUGEINT) * col_n * 1000 // n AS BIGINT) AS expected_milli,
        |       CAST((CAST(obs AS HUGEINT)*n - CAST(row_n AS HUGEINT)*col_n)
        |            * (CAST(obs AS HUGEINT)*n - CAST(row_n AS HUGEINT)*col_n)
        |            * 1000000 // (CAST(n AS HUGEINT) * row_n * col_n)
        |           AS BIGINT) AS contrib_ppm
        |FROM j ORDER BY event_type, cohort""".stripMargin,
    // Next-event Gini impurity over the q102 transition counts; exact
    // floored ppm.
    "q149_transition_gini" ->
      """WITH pr AS (SELECT user_id, event_type,
        |              LAG(event_type) OVER (PARTITION BY user_id
        |                ORDER BY epoch_us(ts), event_id) AS from_type
        |            FROM events),
        |c AS (SELECT from_type, event_type AS to_type, COUNT(*) AS n
        |      FROM pr WHERE from_type IS NOT NULL GROUP BY from_type, to_type),
        |g AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_out,
        |             CAST(COUNT(*) AS INT) AS n_next_types,
        |             CAST(SUM(n*n) AS BIGINT) AS sq
        |      FROM c GROUP BY from_type)
        |SELECT from_type, n_out, n_next_types,
        |       CAST((CAST(n_out AS HUGEINT)*n_out - sq) * 1000000
        |            // (CAST(n_out AS HUGEINT)*n_out) AS BIGINT) AS gini_ppm
        |FROM g ORDER BY from_type""".stripMargin,
    // Session trigrams: q120's session assignment verbatim, two leads
    // inside the (user, session) window, top-15 with contractual rank.
    "q150_session_trigrams" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sess AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         SUM(new_session) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged),
        |tg AS (
        |  SELECT event_type || '>' || LEAD(event_type, 1) OVER ws
        |           || '>' || LEAD(event_type, 2) OVER ws AS trigram,
        |         LEAD(event_type, 2) OVER ws AS t3
        |  FROM sess
        |  WINDOW ws AS (PARTITION BY user_id, session_id
        |                ORDER BY epoch_us(ts), event_id)),
        |c AS (SELECT trigram, COUNT(*) AS n_occurrences FROM tg
        |      WHERE t3 IS NOT NULL GROUP BY trigram),
        |k AS (SELECT * FROM c ORDER BY n_occurrences DESC, trigram LIMIT 15)
        |SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, trigram) AS INT) AS rank,
        |       trigram, n_occurrences
        |FROM k ORDER BY n_occurrences DESC, trigram""".stripMargin,
    // TPC-H Q7 shape: both directions of the nation pair; exact cents.
    "q151_volume_shipping" ->
      s"""WITH nat AS (SELECT n_nationkey, n_name FROM nation
         |             WHERE n_name IN ('NATION_3', 'NATION_7')),
         |s AS (SELECT s_suppkey, n_name AS supp_nation
         |      FROM supplier JOIN nat ON s_nationkey = n_nationkey),
         |c AS (SELECT c_custkey, n_name AS cust_nation
         |      FROM customer JOIN nat ON c_nationkey = n_nationkey)
         |SELECT supp_nation, cust_nation,
         |       CAST(year(l_shipdate) AS INT) AS ship_year,
         |       COUNT(*) AS n_items, ${moneySum("l_extendedprice")} AS revenue
         |FROM lineitem JOIN s ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN c ON o_custkey = c_custkey
         |WHERE supp_nation <> cust_nation
         |GROUP BY supp_nation, cust_nation, ship_year
         |ORDER BY supp_nation, cust_nation, ship_year""".stripMargin,
    // TPC-H Q8 shape: one nation's share of a region market per year,
    // exact integer basis points.
    "q152_market_share" ->
      s"""WITH mkt AS (SELECT n_nationkey FROM nation
         |             JOIN region ON n_regionkey = r_regionkey
         |             WHERE r_name = 'EUROPE'),
         |s AS (SELECT s_suppkey,
         |             CASE WHEN n_name = 'NATION_8' THEN 1 ELSE 0 END AS is_target
         |      FROM supplier JOIN nation ON s_nationkey = n_nationkey),
         |li AS (SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
         |              ${cents("l_extendedprice")} AS c, s.is_target
         |       FROM lineitem JOIN s ON l_suppkey = s.s_suppkey
         |       JOIN orders ON l_orderkey = o_orderkey
         |       WHERE o_custkey IN (SELECT c_custkey FROM customer
         |                           WHERE c_nationkey IN (SELECT n_nationkey FROM mkt))),
         |g AS (SELECT ship_year,
         |             CAST(SUM(CASE WHEN is_target = 1 THEN c ELSE 0 END) AS BIGINT) AS tc,
         |             CAST(SUM(c) AS BIGINT) AS mc
         |      FROM li GROUP BY ship_year)
         |SELECT ship_year, CAST(tc AS DOUBLE)/100.0 AS target_revenue,
         |       CAST(mc AS DOUBLE)/100.0 AS market_revenue,
         |       CAST((tc * 10000) // mc AS INT) AS share_bp
         |FROM g ORDER BY ship_year""".stripMargin,
    // TPC-H Q16 shape: distinct suppliers per (brand, size), NOT IN a
    // disqualified set.
    "q153_supplier_diversity" ->
      """WITH bad AS (SELECT l_suppkey FROM lineitem
        |             GROUP BY l_suppkey
        |             HAVING COUNT(*) FILTER (WHERE l_returnflag = 'R'
        |                                       AND l_discount >= 0.09) * 20
        |                    > COUNT(*))
        |SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN (SELECT l_suppkey FROM bad)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,
    // TPC-H Q20 shape: one year dominates a (supplier, part) shipping
    // history; suppliers with >= 3 such parts.
    "q154_concentrated_ship" ->
      s"""WITH g AS (SELECT l_suppkey, l_partkey,
         |             CAST(SUM(CASE WHEN year(l_shipdate) = 1997
         |                           THEN ${cents("l_quantity")} ELSE 0 END) AS BIGINT) AS q_year,
         |             CAST(SUM(${cents("l_quantity")}) AS BIGINT) AS q_total
         |           FROM lineitem GROUP BY l_suppkey, l_partkey),
         |f AS (SELECT l_suppkey, COUNT(*) AS n_concentrated_parts
         |      FROM g WHERE q_year * 2 > q_total
         |      GROUP BY l_suppkey HAVING COUNT(*) >= 3)
         |SELECT s_suppkey, s_name, n_name, n_concentrated_parts
         |FROM f JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |ORDER BY n_concentrated_parts DESC, s_suppkey""".stripMargin,
    // TPC-H Q11 shape: parts whose corpus revenue share clears a
    // POPULATION-RELATIVE floor (1.4x the mean share 10^6/n ppm — a
    // fixed ppm floor goes vacuous as soon as the part count grows).
    "q155_important_parts" ->
      s"""WITH pp AS (SELECT l_partkey,
         |              CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) AS c
         |            FROM lineitem GROUP BY l_partkey),
         |t AS (SELECT CAST(SUM(c) AS BIGINT) AS tot,
         |             COUNT(*) AS n_parts FROM pp),
         |m AS (SELECT l_partkey, c,
         |             CAST(CAST(c AS HUGEINT) * 1000000 // tot AS BIGINT) AS share_ppm,
         |             greatest(1, 14000000 // (10 * n_parts)) AS thr
         |      FROM pp CROSS JOIN t)
         |SELECT l_partkey AS p_partkey, CAST(c AS DOUBLE)/100.0 AS revenue,
         |       share_ppm
         |FROM m WHERE share_ppm >= thr
         |ORDER BY share_ppm DESC, p_partkey""".stripMargin,
    // First/last-touch attribution: journeys cut at purchases by a
    // running prior-purchase count; touch extremes via rank windows.
    "q183_touch_attribution" ->
      """WITH e AS (SELECT event_id, ts, user_id, event_type,
        |                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
        |                 CAST(ROUND(value*100, 0) AS BIGINT) AS vc
        |          FROM events),
        |w AS (SELECT *, COALESCE(SUM(is_p) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS jid
        |      FROM e),
        |t AS (SELECT user_id, jid, event_type,
        |             row_number() OVER (PARTITION BY user_id, jid
        |               ORDER BY ts, event_id) AS rn_a,
        |             row_number() OVER (PARTITION BY user_id, jid
        |               ORDER BY ts DESC, event_id DESC) AS rn_d
        |      FROM w WHERE event_type IN ('click', 'view')),
        |ft AS (SELECT user_id, jid,
        |              MIN(CASE WHEN rn_a = 1 THEN event_type END) AS first_touch,
        |              MIN(CASE WHEN rn_d = 1 THEN event_type END) AS last_touch
        |       FROM t GROUP BY user_id, jid),
        |p AS (SELECT user_id, jid, CAST(SUM(vc) AS BIGINT) AS vc
        |      FROM w WHERE is_p = 1 GROUP BY user_id, jid),
        |b AS (SELECT p.vc, COALESCE(ft.first_touch, 'direct') AS first_touch,
        |             COALESCE(ft.last_touch, 'direct') AS last_touch
        |      FROM p LEFT JOIN ft ON p.user_id = ft.user_id AND p.jid = ft.jid)
        |SELECT model, touch_type, n_journeys, attributed_value FROM (
        |  SELECT 'first_touch' AS model, first_touch AS touch_type,
        |         COUNT(*) AS n_journeys,
        |         CAST(SUM(vc) AS DOUBLE)/100.0 AS attributed_value
        |  FROM b GROUP BY first_touch
        |  UNION ALL
        |  SELECT 'last_touch' AS model, last_touch AS touch_type,
        |         COUNT(*) AS n_journeys,
        |         CAST(SUM(vc) AS DOUBLE)/100.0 AS attributed_value
        |  FROM b GROUP BY last_touch) z
        |ORDER BY model, touch_type""".stripMargin,
    // TPC-H Q19 shape: one fact pass under an OR-of-ANDs bracket.
    "q166_bracket_revenue" ->
      s"""WITH li AS (SELECT l_partkey, ${cents("l_quantity")} AS qc,
         |                  ${cents("l_extendedprice")} AS c FROM lineitem)
         |SELECT COUNT(*) AS n_items, CAST(SUM(c) AS DOUBLE)/100.0 AS revenue
         |FROM li JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |       AND qc BETWEEN 100 AND 1100)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         |       AND qc BETWEEN 1000 AND 2000)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
         |       AND qc BETWEEN 2000 AND 3000)""".stripMargin,
    // TPC-H Q10 shape: quarterly returned revenue per customer, top 20.
    "q167_returned_items" ->
      s"""WITH li AS (SELECT l_orderkey, ${cents("l_extendedprice")} AS c
         |            FROM lineitem
         |            WHERE l_returnflag = 'R'
         |              AND l_shipdate >= TIMESTAMP '1996-01-01'
         |              AND l_shipdate <  TIMESTAMP '1996-04-01'),
         |g AS (SELECT o_custkey, COUNT(*) AS n_returned_items,
         |             CAST(SUM(c) AS BIGINT) AS rc
         |      FROM li JOIN orders ON l_orderkey = o_orderkey
         |      GROUP BY o_custkey)
         |SELECT c_custkey, c_name, n_name, n_returned_items,
         |       CAST(rc AS DOUBLE)/100.0 AS returned_revenue
         |FROM g JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |ORDER BY returned_revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,
    // TPC-H Q4 shape: EXISTS a late lineitem, counted per priority.
    "q169_priority_check" ->
      """SELECT o_orderpriority, COUNT(*) AS n_late_orders
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND date_diff('day', CAST(o.o_orderdate AS DATE),
        |                              CAST(l.l_shipdate AS DATE)) > 30)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // TPC-H Q1 shape: the canonical pricing-summary scan. All sums are
    // exact integers (cents × integer percent) until the final division.
    "q170_pricing_summary" ->
      s"""WITH li AS (SELECT l_returnflag, l_linestatus,
         |                  ${cents("l_quantity")} AS qc,
         |                  ${cents("l_extendedprice")} AS c,
         |                  ${cents("l_discount")} AS dc,
         |                  ${cents("l_tax")} AS tc
         |            FROM lineitem
         |            WHERE l_shipdate <= TIMESTAMP '2000-12-01')
         |SELECT l_returnflag, l_linestatus,
         |       CAST(SUM(qc) AS DOUBLE)/100.0 AS sum_qty,
         |       CAST(SUM(c) AS DOUBLE)/100.0 AS sum_base_price,
         |       CAST(SUM(c*(100-dc)) AS DOUBLE)/10000.0 AS sum_disc_price,
         |       CAST(SUM(c*(100-dc)*(100+tc)) AS DOUBLE)/1000000.0 AS sum_charge,
         |       CAST(SUM(qc) AS DOUBLE)/COUNT(*)/100.0 AS avg_qty,
         |       CAST(SUM(c) AS DOUBLE)/COUNT(*)/100.0 AS avg_price,
         |       CAST(SUM(dc) AS DOUBLE)/COUNT(*)/100.0 AS avg_disc,
         |       COUNT(*) AS count_order
         |FROM li GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // TPC-H Q3 shape: unshipped revenue of one segment's orders, top 10.
    "q171_ship_priority" ->
      s"""WITH li AS (SELECT l_orderkey, ${cents("l_extendedprice")} AS c,
         |                  ${cents("l_discount")} AS dc
         |            FROM lineitem
         |            WHERE l_shipdate > TIMESTAMP '1996-06-01'),
         |ord AS (SELECT o_orderkey, o_orderdate, o_orderpriority
         |        FROM orders JOIN customer ON o_custkey = c_custkey
         |        WHERE o_orderdate < TIMESTAMP '1996-06-01'
         |          AND c_mktsegment = 'BUILDING')
         |SELECT l_orderkey,
         |       CAST(SUM(c*(100-dc)) AS DOUBLE)/10000.0 AS revenue,
         |       CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
         |FROM li JOIN ord ON l_orderkey = o_orderkey
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, order_date, l_orderkey
         |LIMIT 10""".stripMargin,
    // TPC-H Q6 shape: pure scan-side conditional aggregate; every
    // predicate is a raw-column comparison (pushdown showcase).
    "q172_revenue_delta" ->
      s"""SELECT CAST(SUM(c*dc) AS DOUBLE)/10000.0 AS forecast_revenue,
         |       COUNT(*) AS n_items
         |FROM (SELECT ${cents("l_extendedprice")} AS c,
         |             ${cents("l_discount")} AS dc
         |      FROM lineitem
         |      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |        AND l_shipdate <  TIMESTAMP '1997-01-01'
         |        AND l_discount >= CAST(0.05 AS DOUBLE)
         |        AND l_discount <= CAST(0.07 AS DOUBLE)
         |        AND l_quantity < 24)""".stripMargin,
    // TPC-H Q9 shape: nation×year margin on LIKE-pruned parts (retail
    // price proxies the missing partsupp supply cost).
    "q173_product_profit" ->
      s"""WITH p AS (SELECT p_partkey, ${cents("p_retailprice")} AS rc
         |           FROM part WHERE p_name LIKE '%red%'),
         |sn AS (SELECT s_suppkey, n_name
         |       FROM supplier JOIN nation ON s_nationkey = n_nationkey),
         |li AS (SELECT l_orderkey, ${cents("l_quantity")} AS qc,
         |              ${cents("l_extendedprice")} AS c,
         |              ${cents("l_discount")} AS dc, rc, n_name
         |       FROM lineitem JOIN p ON l_partkey = p_partkey
         |       JOIN sn ON l_suppkey = s_suppkey)
         |SELECT n_name AS nation,
         |       CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
         |       CAST(SUM(c*(100-dc) - rc*qc) AS DOUBLE)/10000.0 AS profit,
         |       COUNT(*) AS n_items
         |FROM li JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY nation, o_year
         |ORDER BY nation, o_year DESC""".stripMargin,
    // TPC-H Q13 shape: order-count histogram INCLUDING zero-order
    // customers (the left-outer-join shape).
    "q174_order_count_dist" ->
      """WITH pc AS (SELECT o_custkey, COUNT(*) AS n FROM orders
        |            WHERE o_orderpriority <> '1-URGENT'
        |            GROUP BY o_custkey)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT COALESCE(n, 0) AS c_count
        |      FROM customer LEFT JOIN pc ON c_custkey = o_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // Sliding distinct via bounded fan-out: each (user, day) pair
    // supports the 7 window-end days; ghost days past the last activity
    // clipped by the max-day scalar.
    "q193_rolling_actives" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |b AS (SELECT max(day) AS dmax FROM ud),
        |w AS (SELECT user_id, day + o AS day
        |      FROM ud CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6)) z(o)),
        |wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau
        |        FROM w CROSS JOIN b WHERE day <= dmax GROUP BY day),
        |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY day)
        |SELECT wau.day, COALESCE(dau.dau, 0) AS dau, wau.wau
        |FROM wau LEFT JOIN dau ON dau.day = wau.day
        |ORDER BY wau.day""".stripMargin,

    // The q120 session CTEs, classified by a first-match-wins LIKE
    // cascade (no event-type name is a substring of another).
    "q214_session_patterns" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sess AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         SUM(new_session) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged),
        |paths AS (
        |  SELECT user_id, session_id, COUNT(*) AS n_events,
        |         string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id) AS path
        |  FROM sess GROUP BY user_id, session_id),
        |c AS (SELECT CASE WHEN path LIKE '%view%purchase%' THEN 'view_to_purchase'
        |                  WHEN path LIKE '%purchase%' THEN 'blind_purchase'
        |                  WHEN path LIKE '%error' THEN 'error_exit'
        |                  WHEN n_events = 1 THEN 'bounce'
        |                  WHEN n_events >= 5 THEN 'engaged_browse'
        |                  ELSE 'browse' END AS class,
        |             n_events
        |      FROM paths)
        |SELECT class, COUNT(*) AS n_sessions,
        |       CAST(SUM(n_events) AS BIGINT) AS n_events_total,
        |       CAST(SUM(n_events) * 1000000 // COUNT(*) AS BIGINT)
        |         AS avg_events_ppm
        |FROM c GROUP BY 1 ORDER BY class""".stripMargin,

    // Sum over DISTINCT powers of two IS bitwise OR; decode by integer
    // div/mod so neither engine's bit functions are load-bearing.
    "q216_event_combos" ->
      """WITH b AS (SELECT DISTINCT user_id,
        |             CAST(date_trunc('week', ts) AS DATE) AS wk,
        |             CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
        |                  WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
        |                  WHEN 'view' THEN 16
        |                  ELSE CAST(error('unknown event_type') AS BIGINT)
        |             END AS bv
        |           FROM events),
        |m AS (SELECT user_id, wk, CAST(SUM(bv) AS BIGINT) AS mask
        |      FROM b GROUP BY 1, 2),
        |c AS (SELECT mask, COUNT(*) AS n_user_weeks FROM m GROUP BY 1)
        |SELECT CAST(mask AS INT) AS mask,
        |       CAST((mask // 1) % 2 + (mask // 2) % 2 + (mask // 4) % 2
        |            + (mask // 8) % 2 + (mask // 16) % 2 AS INT) AS n_types,
        |       concat_ws('+',
        |         CASE WHEN (mask // 1) % 2 = 1 THEN 'click' END,
        |         CASE WHEN (mask // 2) % 2 = 1 THEN 'error' END,
        |         CASE WHEN (mask // 4) % 2 = 1 THEN 'purchase' END,
        |         CASE WHEN (mask // 8) % 2 = 1 THEN 'signup' END,
        |         CASE WHEN (mask // 16) % 2 = 1 THEN 'view' END) AS combo,
        |       n_user_weeks
        |FROM c ORDER BY mask""".stripMargin,
  )
}
