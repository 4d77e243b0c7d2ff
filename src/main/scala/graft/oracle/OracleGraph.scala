package graft.oracle

import graft.oracle.OracleDialect._

/** DuckDB oracle SQL — graph tier
  * (12 queries). Values are verbatim from SparkEntry.scala
  * (round-11 mechanical split); SparkEntry.oracleSql concatenates the
  * domain maps, and QueriesSpec pins key-set equality (both directions) with the
  * query registry. */
object OracleGraph {
  /** One ALS ridge half-step (q294, generated): solve `out`'s factors
    * for key `solveKey` from the fixed side `fixedRel` keyed by
    * `fixedKey`. Exact-integer sufficient statistics (milli-unit
    * products), closed-form 2×2 solve in doubles with the IDENTICAL
    * operand order as graft.ext.Factorization.halfStep, re-quantized
    * to milli-units and clamped to ±100000. */
  private def alsHalfStep(out: String, solveKey: String, fixedRel: String,
                          fixedKey: String): String = {
    def solve(num: String): String =
      s"""GREATEST(-100000, LEAST(100000, CAST(ROUND(($num)
         | / ((CAST(a11 AS DOUBLE)/1000000.0 + 0.1)
         |      * (CAST(a22 AS DOUBLE)/1000000.0 + 0.1)
         |    - (CAST(a12 AS DOUBLE)/1000000.0)
         |      * (CAST(a12 AS DOUBLE)/1000000.0))
         | * 1000, 0) AS BIGINT)))""".stripMargin
    s"""st_$out AS (SELECT rt.$solveKey AS k,
       |    CAST(SUM(f.f1*f.f1) AS BIGINT) AS a11,
       |    CAST(SUM(f.f1*f.f2) AS BIGINT) AS a12,
       |    CAST(SUM(f.f2*f.f2) AS BIGINT) AS a22,
       |    CAST(SUM(f.f1*rt.r) AS BIGINT) AS b1,
       |    CAST(SUM(f.f2*rt.r) AS BIGINT) AS b2
       |  FROM rt JOIN $fixedRel f ON rt.$fixedKey = f.$fixedKey
       |  GROUP BY 1),
       |$out AS (SELECT k AS $solveKey,
       |  ${solve(
            """(CAST(a22 AS DOUBLE)/1000000.0 + 0.1)
              |      * (CAST(b1 AS DOUBLE)/1000.0)
              |    - (CAST(a12 AS DOUBLE)/1000000.0)
              |      * (CAST(b2 AS DOUBLE)/1000.0)""".stripMargin)} AS f1,
       |  ${solve(
            """(CAST(a11 AS DOUBLE)/1000000.0 + 0.1)
              |      * (CAST(b2 AS DOUBLE)/1000.0)
              |    - (CAST(a12 AS DOUBLE)/1000000.0)
              |      * (CAST(b1 AS DOUBLE)/1000.0)""".stripMargin)} AS f2
       |  FROM st_$out)""".stripMargin
  }

  /** q294 per-round training-fit eval (generated): exact micro-unit
    * residuals, squared in HUGEINT, one shared sqrt. */
  private def alsEval(rnd: Int, x: String, y: String): String =
    s"""ev$rnd AS (SELECT c.c_mktsegment AS segment,
       |    x.f1*y.f1 + x.f2*y.f2 - rt.r*1000000 AS d
       |  FROM rt JOIN $x x ON rt.u = x.u JOIN $y y ON rt.i = y.i
       |       JOIN customer c ON rt.u = c.c_custkey),
       |r$rnd AS (SELECT CAST($rnd AS INT) AS als_round, segment,
       |    CAST(COUNT(*) AS BIGINT) AS n_ratings,
       |    CAST(ROUND(SQRT(CAST(SUM(CAST(d AS HUGEINT)*d) AS DOUBLE)
       |      / COUNT(*)), 0) AS BIGINT) AS rmse_micro
       |  FROM ev$rnd GROUP BY segment)""".stripMargin

  /** Rank-2 ALS, 2 unrolled alternating rounds — mirrors
    * graft.ext.Factorization.alsRank2Report exactly: deterministic
    * affine-mod item init in [1000, 2000) milli-units, per-entity
    * integer normal equations, closed-form ridge solve re-quantized
    * and clamped each half-step, per-(round, segment) RMSE. */
  private lazy val alsSql: String =
    s"""WITH rt AS (SELECT o_custkey AS u, l_partkey AS i,
       |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS r
       |       FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |       GROUP BY 1, 2),
       |y0 AS (SELECT i,
       |         1000 + i % 2147483647 * 1000003 % 2147483647 % 1000 AS f1,
       |         1000 + i % 2147483647 * 2654435761 % 2147483647 % 1000 AS f2
       |       FROM (SELECT DISTINCT i FROM rt) z),
       |${alsHalfStep("x1t", "u", "y0", "i")},
       |${alsHalfStep("y1t", "i", "x1t", "u")},
       |${alsEval(1, "x1t", "y1t")},
       |${alsHalfStep("x2t", "u", "y1t", "i")},
       |${alsHalfStep("y2t", "i", "x2t", "u")},
       |${alsEval(2, "x2t", "y2t")}
       |SELECT * FROM r1 UNION ALL SELECT * FROM r2
       |ORDER BY als_round, segment""".stripMargin

  /** One q305 implicit-feedback half-step (generated): HKV confidence
    * weights α=40, the unobserved mass folded through the global factor
    * Gram (CROSS JOIN of a 1-row 2×2), solve mirrored operand-for-
    * operand against Factorization.implicitHalfStep. MATERIALIZED —
    * each factor table is read by the next half-step AND both eval
    * legs. */
  private def alsImplicitHalfStep(out: String, solveKey: String,
                                  fixedRel: String,
                                  fixedKey: String): String = {
    def solve(num: String): String =
      s"""GREATEST(-100000, LEAST(100000, CAST(ROUND(($num)
         | / ((CAST(g11 + a11 AS DOUBLE)/1000000.0 + 0.1)
         |      * (CAST(g22 + a22 AS DOUBLE)/1000000.0 + 0.1)
         |    - (CAST(g12 + a12 AS DOUBLE)/1000000.0)
         |      * (CAST(g12 + a12 AS DOUBLE)/1000000.0))
         | * 1000, 0) AS BIGINT)))""".stripMargin
    s"""st_$out AS (SELECT rt.$solveKey AS k,
       |    CAST(SUM(f.f1*f.f1*rt.r*40) AS BIGINT) AS a11,
       |    CAST(SUM(f.f1*f.f2*rt.r*40) AS BIGINT) AS a12,
       |    CAST(SUM(f.f2*f.f2*rt.r*40) AS BIGINT) AS a22,
       |    CAST(SUM((1 + 40*rt.r)*f.f1) AS BIGINT) AS b1,
       |    CAST(SUM((1 + 40*rt.r)*f.f2) AS BIGINT) AS b2
       |  FROM rt JOIN $fixedRel f ON rt.$fixedKey = f.$fixedKey
       |  GROUP BY 1),
       |gr_$out AS (SELECT CAST(SUM(f1*f1) AS BIGINT) AS g11,
       |    CAST(SUM(f1*f2) AS BIGINT) AS g12,
       |    CAST(SUM(f2*f2) AS BIGINT) AS g22
       |  FROM $fixedRel),
       |$out AS MATERIALIZED (SELECT k AS $solveKey,
       |  ${solve(
            """(CAST(g22 + a22 AS DOUBLE)/1000000.0 + 0.1)
              |      * (CAST(b1 AS DOUBLE)/1000.0)
              |    - (CAST(g12 + a12 AS DOUBLE)/1000000.0)
              |      * (CAST(b2 AS DOUBLE)/1000.0)""".stripMargin)} AS f1,
       |  ${solve(
            """(CAST(g11 + a11 AS DOUBLE)/1000000.0 + 0.1)
              |      * (CAST(b2 AS DOUBLE)/1000.0)
              |    - (CAST(g12 + a12 AS DOUBLE)/1000000.0)
              |      * (CAST(b1 AS DOUBLE)/1000.0)""".stripMargin)} AS f2
       |  FROM st_$out CROSS JOIN gr_$out)""".stripMargin
  }

  /** q305 per-round eval (generated): confidence-weighted RMSE over the
    * observed pairs + the Gram-trick background term (mean squared
    * score over ALL segment (user, item) pairs), both exact. */
  private def alsImplicitEval(rnd: Int, x: String, y: String): String =
    s"""ev$rnd AS (SELECT c.c_mktsegment AS segment, (1 + 40*rt.r) AS cw,
       |    1000000 - (x.f1*y.f1 + x.f2*y.f2) AS d
       |  FROM rt JOIN $x x ON rt.u = x.u JOIN $y y ON rt.i = y.i
       |       JOIN customer c ON rt.u = c.c_custkey),
       |ob$rnd AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_ratings,
       |    CAST(SUM(cw) AS BIGINT) AS c_sum,
       |    SUM(CAST(cw AS HUGEINT) * CAST(d AS HUGEINT) * d) AS wsse
       |  FROM ev$rnd GROUP BY segment),
       |gy$rnd AS (SELECT CAST(SUM(f1*f1) AS BIGINT) AS g11,
       |    CAST(SUM(f1*f2) AS BIGINT) AS g12,
       |    CAST(SUM(f2*f2) AS BIGINT) AS g22,
       |    CAST(COUNT(*) AS BIGINT) AS n_items FROM $y),
       |bx$rnd AS (SELECT c.c_mktsegment AS segment, n_items,
       |    CAST(x.f1 AS HUGEINT)*x.f1*g11
       |      + 2*CAST(x.f1 AS HUGEINT)*x.f2*g12
       |      + CAST(x.f2 AS HUGEINT)*x.f2*g22 AS xgx
       |  FROM $x x CROSS JOIN gy$rnd
       |       JOIN customer c ON x.u = c.c_custkey),
       |bg$rnd AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_users,
       |    SUM(xgx) AS xgx_sum, MAX(n_items) AS n_items
       |  FROM bx$rnd GROUP BY segment),
       |r$rnd AS (SELECT CAST($rnd AS INT) AS als_round, o.segment,
       |    o.n_ratings, o.c_sum,
       |    CAST(ROUND(SQRT(CAST(o.wsse AS DOUBLE) / o.c_sum), 0) AS BIGINT)
       |      AS wrmse_micro,
       |    CAST(b.xgx_sum // (b.n_users * b.n_items * 1000000) AS BIGINT)
       |      AS bg_micro
       |  FROM ob$rnd o JOIN bg$rnd b ON o.segment = b.segment)""".stripMargin

  /** Implicit-feedback rank-2 ALS (q305), 2 unrolled alternating rounds
    * — mirrors graft.ext.Factorization.alsImplicitReport exactly: same
    * deterministic init and ratings fact as q294, HKV confidence
    * weighting, Gram-folded unobserved mass, per-(round, segment)
    * weighted RMSE + background term. */
  private lazy val alsImplicitSql: String =
    s"""WITH rt AS MATERIALIZED (SELECT o_custkey AS u, l_partkey AS i,
       |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS r
       |       FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |       GROUP BY 1, 2),
       |y0 AS MATERIALIZED (SELECT i,
       |         1000 + i % 2147483647 * 1000003 % 2147483647 % 1000 AS f1,
       |         1000 + i % 2147483647 * 2654435761 % 2147483647 % 1000 AS f2
       |       FROM (SELECT DISTINCT i FROM rt) z),
       |${alsImplicitHalfStep("xi1", "u", "y0", "i")},
       |${alsImplicitHalfStep("yi1", "i", "xi1", "u")},
       |${alsImplicitEval(1, "xi1", "yi1")},
       |${alsImplicitHalfStep("xi2", "u", "yi1", "i")},
       |${alsImplicitHalfStep("yi2", "i", "xi2", "u")},
       |${alsImplicitEval(2, "xi2", "yi2")}
       |SELECT * FROM r1 UNION ALL SELECT * FROM r2
       |ORDER BY als_round, segment""".stripMargin

  /** One Borůvka round (q299, generated): cross-component edge census,
    * per-component best-edge selection under the (s DESC, u, v) total
    * order, EXACT merge via a recursive min-label closure over the
    * selected edges' component graph (mirrors the Spark side's
    * propagate-to-fixpoint loop — a bounded-hop merge could let a split
    * label re-select an intra-component edge and grow a cycle), relabel,
    * stats row. MATERIALIZED on every multiply-referenced relation —
    * unmaterialized CTEs inline per reference and a 3-round chain would
    * re-evaluate its whole prefix exponentially. */
  private def boruvkaRound(r: Int): String = {
    val cuParts = (1 to r).map(i => s"SELECT u, v, s FROM se$i")
      .mkString(" UNION ALL ")
    s"""el$r AS MATERIALIZED (SELECT e.u, e.v, e.s, a.l AS lu, b.l AS lv
       |  FROM ew e JOIN l$r a ON e.u = a.node JOIN l$r b ON e.v = b.node
       |  WHERE a.l <> b.l),
       |se$r AS MATERIALIZED (SELECT DISTINCT u, v, s FROM (
       |    SELECT u, v, s, row_number() OVER (PARTITION BY l
       |      ORDER BY s DESC, u, v) AS rn FROM (
       |        SELECT lu AS l, u, v, s FROM el$r
       |        UNION ALL SELECT lv, u, v, s FROM el$r) z) w
       |  WHERE rn = 1),
       |sl$r AS (SELECT a.l AS lu, b.l AS lv FROM se$r e
       |  JOIN l$r a ON e.u = a.node JOIN l$r b ON e.v = b.node),
       |lg$r AS MATERIALIZED (SELECT lu AS a, lv AS b FROM sl$r
       |  UNION ALL SELECT lv, lu FROM sl$r),
       |rr$r(l, m) AS (SELECT l, l FROM (SELECT DISTINCT l FROM l$r) z
       |  UNION
       |  SELECT g.a, rr$r.m FROM lg$r g JOIN rr$r ON rr$r.l = g.b),
       |mm$r AS MATERIALIZED (SELECT l, MIN(m) AS m FROM rr$r GROUP BY l),
       |l${r + 1} AS MATERIALIZED (SELECT t.node, mm.m AS l
       |  FROM l$r t JOIN mm$r mm ON t.l = mm.l),
       |cu$r AS MATERIALIZED (SELECT DISTINCT u, v, s FROM ($cuParts) z),
       |st$r AS (SELECT CAST($r AS INT) AS round,
       |  (SELECT CAST(COUNT(DISTINCT l) AS BIGINT) FROM l$r)
       |    AS n_components_before,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM el$r) AS n_cross_edges,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM se$r) AS n_edges_added,
       |  (SELECT CAST(COALESCE(SUM(s), 0) AS BIGINT) FROM se$r)
       |    AS support_added,
       |  (SELECT CAST(COUNT(DISTINCT l) AS BIGINT) FROM l${r + 1})
       |    AS n_components_after,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cu$r) AS forest_edges_total,
       |  (SELECT CAST(COALESCE(SUM(s), 0) AS BIGINT) FROM cu$r)
       |    AS forest_support_total)""".stripMargin
  }

  /** One k-truss peel (q301, generated): degree-oriented per-edge
    * triangle support (pivot on the lower-(degree, id) endpoint — the
    * q142 discipline), drop edges below k−2, stats row. MATERIALIZED on
    * the relations the next round re-reads. */
  private def ktrussRound(r: Int, minSup: Int): String =
    s"""ad$r AS MATERIALIZED (SELECT u AS a, v AS b FROM e$r
       |  UNION ALL SELECT v, u FROM e$r),
       |dg$r AS (SELECT a, COUNT(*) AS deg FROM ad$r GROUP BY a),
       |pv$r AS (SELECT e.u, e.v,
       |    CASE WHEN (du.deg, e.u) <= (dv.deg, e.v) THEN e.u ELSE e.v
       |      END AS p,
       |    CASE WHEN (du.deg, e.u) <= (dv.deg, e.v) THEN e.v ELSE e.u
       |      END AS o
       |  FROM e$r e JOIN dg$r du ON e.u = du.a JOIN dg$r dv ON e.v = dv.a),
       |wg$r AS (SELECT p.u, p.v, p.o, x.b AS wn
       |  FROM pv$r p JOIN ad$r x ON x.a = p.p WHERE x.b <> p.o),
       |sp$r AS MATERIALIZED (SELECT g.u, g.v, CAST(COUNT(*) AS BIGINT) AS sup
       |  FROM wg$r g JOIN ad$r y ON y.a = g.o AND y.b = g.wn GROUP BY 1, 2),
       |sc$r AS MATERIALIZED (SELECT e.u, e.v, COALESCE(sp.sup, 0) AS sup
       |  FROM e$r e LEFT JOIN sp$r sp ON e.u = sp.u AND e.v = sp.v),
       |e${r + 1} AS MATERIALIZED (SELECT u, v FROM sc$r WHERE sup >= $minSup),
       |ts$r AS (SELECT CAST($r AS INT) AS round,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e$r) AS n_edges_before,
       |  (SELECT CAST(COALESCE(SUM(sup), 0) // 3 AS BIGINT) FROM sc$r)
       |    AS n_triangles,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e$r)
       |    - (SELECT CAST(COUNT(*) AS BIGINT) FROM e${r + 1}) AS n_dropped,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e${r + 1}) AS n_edges_after,
       |  CAST(CASE WHEN (SELECT COUNT(*) FROM e$r) =
       |    (SELECT COUNT(*) FROM e${r + 1}) THEN 1 ELSE 0 END AS INT)
       |    AS converged)""".stripMargin

  /** k-truss (k=4) peeling trajectory, 3 unrolled rounds over the
    * support-≥2 co-purchase edges — mirrors
    * graft.operators.Graph.ktrussTrajectory exactly. */
  private lazy val ktrussSql: String = {
    val rounds = (1 to 3).map(ktrussRound(_, 2)).mkString(",\n")
    s"""WITH it AS MATERIALIZED (SELECT DISTINCT l_orderkey AS okey,
       |    l_partkey AS p FROM lineitem),
       |e1 AS MATERIALIZED (SELECT a.p AS u, b.p AS v
       |  FROM it a JOIN it b ON a.okey = b.okey AND a.p < b.p
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |$rounds
       |SELECT * FROM ts1 UNION ALL SELECT * FROM ts2
       |UNION ALL SELECT * FROM ts3
       |ORDER BY round""".stripMargin
  }

  /** Borůvka maximum-spanning-forest trajectory, 3 unrolled rounds over
    * the support-≥2 co-purchase edges — mirrors
    * graft.operators.Graph.boruvkaForest exactly. */
  private lazy val boruvkaSql: String = {
    val rounds = (1 to 3).map(boruvkaRound).mkString(",\n")
    s"""WITH RECURSIVE it AS MATERIALIZED (SELECT DISTINCT l_orderkey AS okey,
       |    l_partkey AS p FROM lineitem),
       |ew AS MATERIALIZED (SELECT a.p AS u, b.p AS v,
       |    CAST(COUNT(*) AS BIGINT) AS s
       |  FROM it a JOIN it b ON a.okey = b.okey AND a.p < b.p
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |l1 AS MATERIALIZED (SELECT node, node AS l FROM (
       |  SELECT DISTINCT node FROM (
       |    SELECT u AS node FROM ew UNION ALL SELECT v FROM ew) z) n),
       |$rounds
       |SELECT * FROM st1 UNION ALL SELECT * FROM st2
       |UNION ALL SELECT * FROM st3
       |ORDER BY round""".stripMargin
  }

  private[graft] val sql: Map[String, String] = Map(
    // Rank-2 ALS training report: 2 unrolled alternating rounds in the
    // exact milli-unit factor contract (generated — see alsSql).
    "q294_als_rank2" -> alsSql,

    // Implicit-feedback rank-2 ALS (HKV): confidence-weighted solves
    // with the Gram-folded unobserved mass (generated — see
    // alsImplicitSql).
    "q305_als_implicit" -> alsImplicitSql,
    // Borůvka max-spanning-forest: 3 unrolled rounds, hash-min merges
    // (generated — see boruvkaSql).
    "q299_boruvka_forest" -> boruvkaSql,
    // k-truss peeling: 3 unrolled degree-oriented support rounds
    // (generated — see ktrussSql).
    "q301_ktruss" -> ktrussSql,
    // 2-iteration integer PageRank over the undirected customer–supplier
    // graph; per-edge floor division exactly as the Spark operator.
    "q140_copurchase_pagerank" ->
      s"""WITH ed AS (SELECT DISTINCT l_suppkey*2 AS sn, o_custkey*2+1 AS cn
         |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |ud AS (SELECT sn AS u, cn AS v FROM ed UNION ALL SELECT cn, sn FROM ed),
         |deg AS (SELECT u, COUNT(*) AS deg FROM ud GROUP BY u),
         |r1 AS (SELECT ud.v AS u,
         |              150000000000 + SUM((CAST(1000000000000 AS BIGINT)*85) // (100*deg.deg)) AS r
         |       FROM ud JOIN deg ON ud.u = deg.u GROUP BY ud.v),
         |r2 AS (SELECT ud.v AS u, 150000000000 + SUM((r1.r*85) // (100*deg.deg)) AS r
         |       FROM ud JOIN r1 ON ud.u = r1.u JOIN deg ON ud.u = deg.u
         |       GROUP BY ud.v)
         |SELECT CASE WHEN d.u % 2 = 0 THEN 'supplier' ELSE 'customer' END AS node_type,
         |       d.u // 2 AS node_key, CAST(d.deg AS BIGINT) AS degree,
         |       CAST(r2.r AS BIGINT) AS rank_units
         |FROM deg d JOIN r2 ON d.u = r2.u
         |ORDER BY rank_units DESC, node_type, node_key
         |LIMIT 25""".stripMargin,
    // Degree-oriented triangle census: orientation by (deg, id) row
    // comparison, wedges at the minimum node, EXISTS closing probe —
    // the oracle states the same oriented algorithm (each triangle
    // generated exactly once), with DuckDB row-value comparisons.
    "q142_triangle_census" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |      FROM items a JOIN items b ON a.okey = b.okey AND a.p < b.p),
        |deg AS (SELECT node, COUNT(*) AS deg FROM (
        |          SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) z
        |        GROUP BY node),
        |o AS (SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS s,
        |             CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS t
        |      FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node),
        |cand AS (SELECT o1.t AS u, o2.t AS v
        |         FROM o o1 JOIN o o2 ON o1.s = o2.s AND o1.t < o2.t),
        |tri AS (SELECT COUNT(*) AS n_triangles FROM cand
        |        WHERE EXISTS (SELECT 1 FROM e WHERE e.u = cand.u AND e.v = cand.v)),
        |ds AS (SELECT COUNT(*) AS n_nodes,
        |              CAST(SUM((deg*(deg-1))//2) AS BIGINT) AS n_wedges FROM deg),
        |es AS (SELECT COUNT(*) AS n_edges FROM e)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        |       CASE WHEN n_wedges = 0 THEN 0
        |            ELSE (3*n_triangles*1000000)//n_wedges END AS clustering_ppm
        |FROM ds CROSS JOIN es CROSS JOIN tri""".stripMargin,
    // Doulion edge-sampled triangle census: the same oriented-wedge
    // algorithm on the hash-gated edge subset, estimate scaled by 1/p^3
    // in exact integer floor division.
    "q175_triangle_sampled" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS p FROM lineitem),
         |e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
         |       FROM items a JOIN items b ON a.okey = b.okey AND a.p < b.p),
         |tot AS (SELECT COUNT(*) AS n_edges_total FROM e0),
         |e AS (SELECT u, v FROM e0
         |      WHERE ((((u*1000003 + v) % ${graft.ext.TextOps.HashP}) * 2654435761 + 97)
         |             % ${graft.ext.TextOps.HashP}) % 1000000 < 250000),
         |deg AS (SELECT node, COUNT(*) AS deg FROM (
         |          SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) z
         |        GROUP BY node),
         |o AS (SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS s,
         |             CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS t
         |      FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node),
         |cand AS (SELECT o1.t AS u, o2.t AS v
         |         FROM o o1 JOIN o o2 ON o1.s = o2.s AND o1.t < o2.t),
         |tri AS (SELECT COUNT(*) AS n_triangles FROM cand
         |        WHERE EXISTS (SELECT 1 FROM e WHERE e.u = cand.u AND e.v = cand.v)),
         |es AS (SELECT COUNT(*) AS n_edges_sampled FROM e)
         |SELECT n_edges_total, n_edges_sampled, CAST(250000 AS BIGINT) AS p_ppm,
         |       n_triangles AS n_triangles_sampled,
         |       CAST(CAST(n_triangles AS HUGEINT) * 1000000000000000000
         |            // ${java.math.BigInteger.valueOf(250000L).pow(3)} AS BIGINT) AS est_triangles
         |FROM tot CROSS JOIN es CROSS JOIN tri""".stripMargin,
    // BFS hop distances as a depth-bounded recursive CTE: UNION dedups
    // (seed, node, dist) walk triples each level, MIN(dist) collapses
    // longer walks to the true shortest hop count — the declarative
    // restatement of the engine's frontier/anti-join expansion.
    // Double-sweep diameter bound on the q188 bipartite graph: BFS
    // (recursive CTE, MIN(dist) collapses longer walks) from the min
    // node id, argmax (dist desc, node) picks the second sweep's
    // source, diameter_lb = max eccentricity.
    "q285_diameter" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT DISTINCT l.l_suppkey * 2 AS u, o.o_custkey * 2 + 1 AS v
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |adj AS (SELECT u AS src, v AS dst FROM pairs
        |        UNION ALL SELECT v, u FROM pairs),
        |u0 AS (SELECT MIN(src) AS s FROM adj),
        |bfs1(node, dist) AS (
        |  SELECT s, 0 FROM u0
        |  UNION
        |  SELECT a.dst, b.dist + 1
        |  FROM bfs1 b JOIN adj a ON a.src = b.node
        |  WHERE b.dist < 6),
        |d1 AS (SELECT node, MIN(dist) AS dist FROM bfs1 GROUP BY node),
        |e1 AS (SELECT node AS far1, dist AS ecc1 FROM d1
        |       ORDER BY dist DESC, node LIMIT 1),
        |n1 AS (SELECT COUNT(*) AS nr1 FROM d1),
        |bfs2(node, dist) AS (
        |  SELECT far1, 0 FROM e1
        |  UNION
        |  SELECT a.dst, b.dist + 1
        |  FROM bfs2 b JOIN adj a ON a.src = b.node
        |  WHERE b.dist < 6),
        |d2 AS (SELECT node, MIN(dist) AS dist FROM bfs2 GROUP BY node),
        |e2 AS (SELECT node AS far2, dist AS ecc2 FROM d2
        |       ORDER BY dist DESC, node LIMIT 1),
        |n2 AS (SELECT COUNT(*) AS nr2 FROM d2),
        |lb AS (SELECT greatest(ecc1, ecc2) AS diameter_lb
        |       FROM e1 CROSS JOIN e2)
        |SELECT CAST(1 AS INT) AS sweep, CAST(u0.s AS BIGINT) AS source_node,
        |       CAST(e1.far1 AS BIGINT) AS far_node,
        |       CAST(e1.ecc1 AS INT) AS ecc, CAST(n1.nr1 AS BIGINT) AS n_reached,
        |       CAST(CASE WHEN e1.ecc1 < 6 THEN 1 ELSE 0 END AS INT) AS exact,
        |       CAST(lb.diameter_lb AS INT) AS diameter_lb
        |FROM u0 CROSS JOIN e1 CROSS JOIN n1 CROSS JOIN lb
        |UNION ALL
        |SELECT CAST(2 AS INT), CAST(e1.far1 AS BIGINT),
        |       CAST(e2.far2 AS BIGINT),
        |       CAST(e2.ecc2 AS INT), CAST(n2.nr2 AS BIGINT),
        |       CAST(CASE WHEN e2.ecc2 < 6 THEN 1 ELSE 0 END AS INT),
        |       CAST(lb.diameter_lb AS INT)
        |FROM e1 CROSS JOIN e2 CROSS JOIN n2 CROSS JOIN lb
        |ORDER BY sweep""".stripMargin,

    // iFUB diameter certificate: double-sweep lb, midpoint-rooted ub,
    // two cap-32 fringe probes (multi-source BFS), ub tightened only
    // when every processed fringe fit under the cap (fringe_capped
    // reports overflow); certified = ub == lb AND all sweeps complete.
    "q291_diameter_cert" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT DISTINCT l.l_suppkey * 2 AS u, o.o_custkey * 2 + 1 AS v
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |adj AS (SELECT u AS src, v AS dst FROM pairs
        |        UNION ALL SELECT v, u FROM pairs),
        |u0 AS (SELECT MIN(src) AS s FROM adj),
        |bfs1(node, dist) AS (
        |  SELECT s, 0 FROM u0
        |  UNION
        |  SELECT a.dst, b.dist + 1 FROM bfs1 b JOIN adj a ON a.src = b.node
        |  WHERE b.dist < 6),
        |d1 AS (SELECT node, MIN(dist) AS dist FROM bfs1 GROUP BY node),
        |e1 AS (SELECT node AS far1, dist AS ecc1 FROM d1
        |       ORDER BY dist DESC, node LIMIT 1),
        |bfs2(node, dist) AS (
        |  SELECT far1, 0 FROM e1
        |  UNION
        |  SELECT a.dst, b.dist + 1 FROM bfs2 b JOIN adj a ON a.src = b.node
        |  WHERE b.dist < 6),
        |d2 AS (SELECT node, MIN(dist) AS dist FROM bfs2 GROUP BY node),
        |e2 AS (SELECT node AS far2, dist AS ecc2 FROM d2
        |       ORDER BY dist DESC, node LIMIT 1),
        |bfs3(node, dist) AS (
        |  SELECT far2, 0 FROM e2
        |  UNION
        |  SELECT a.dst, b.dist + 1 FROM bfs3 b JOIN adj a ON a.src = b.node
        |  WHERE b.dist < 6),
        |d3 AS (SELECT node, MIN(dist) AS dist3 FROM bfs3 GROUP BY node),
        |ec3 AS (SELECT MAX(dist3) AS ecc3 FROM d3),
        |md AS (SELECT d2.node AS root
        |       FROM d2 JOIN d3 ON d2.node = d3.node CROSS JOIN e2
        |       WHERE d2.dist + d3.dist3 = e2.ecc2
        |         AND abs(d2.dist - d3.dist3) <= 1
        |       ORDER BY d2.node LIMIT 1),
        |bfsm(node, dist) AS (
        |  SELECT root, 0 FROM md
        |  UNION
        |  SELECT a.dst, b.dist + 1 FROM bfsm b JOIN adj a ON a.src = b.node
        |  WHERE b.dist < 6),
        |dmm AS (SELECT node, MIN(dist) AS dist FROM bfsm GROUP BY node),
        |em AS (SELECT MAX(dist) AS ecc_root FROM dmm),
        |f0 AS (SELECT node FROM dmm CROSS JOIN em WHERE dist = ecc_root),
        |nf0 AS (SELECT COUNT(*) AS n_fringe0 FROM f0),
        |p0 AS (SELECT node FROM f0 ORDER BY node LIMIT 32),
        |bp0(seed, node, dist) AS (
        |  SELECT node, node, 0 FROM p0
        |  UNION
        |  SELECT b.seed, a.dst, b.dist + 1
        |  FROM bp0 b JOIN adj a ON a.src = b.node WHERE b.dist < 6),
        |pd0 AS (SELECT seed, node, MIN(dist) AS dist FROM bp0
        |        GROUP BY seed, node),
        |pm0 AS (SELECT COALESCE(MAX(ecc), 0) AS pmax0 FROM (
        |          SELECT seed, MAX(dist) AS ecc FROM pd0 GROUP BY seed) z),
        |f1 AS (SELECT node FROM dmm CROSS JOIN em
        |       WHERE dist = ecc_root - 1),
        |nf1 AS (SELECT COUNT(*) AS n_fringe1 FROM f1),
        |p1 AS (SELECT node FROM f1 ORDER BY node LIMIT 32),
        |bp1(seed, node, dist) AS (
        |  SELECT node, node, 0 FROM p1
        |  UNION
        |  SELECT b.seed, a.dst, b.dist + 1
        |  FROM bp1 b JOIN adj a ON a.src = b.node WHERE b.dist < 6),
        |pd1 AS (SELECT seed, node, MIN(dist) AS dist FROM bp1
        |        GROUP BY seed, node),
        |pm1 AS (SELECT COALESCE(MAX(ecc), 0) AS pmax1 FROM (
        |          SELECT seed, MAX(dist) AS ecc FROM pd1 GROUP BY seed) z),
        |s0 AS (SELECT root, ecc_root,
        |         greatest(ecc1, ecc2) AS lb0, ecc_root * 2 AS ub0,
        |         CASE WHEN ecc1 < 6 AND ecc2 < 6 AND ecc3 < 6
        |              AND ecc_root < 6 THEN 1 ELSE 0 END AS exact,
        |         n_fringe0, pmax0, n_fringe1, pmax1
        |       FROM e1 CROSS JOIN e2 CROSS JOIN ec3 CROSS JOIN em
        |       CROSS JOIN md CROSS JOIN nf0 CROSS JOIN pm0
        |       CROSS JOIN nf1 CROSS JOIN pm1),
        |s1 AS (SELECT *, greatest(lb0, pmax0) AS lb1,
        |         CASE WHEN n_fringe0 <= 32 THEN 1 ELSE 0 END AS full1
        |       FROM s0),
        |s2 AS (SELECT *, CASE WHEN full1 = 1
        |         THEN least(ub0, greatest(lb1, (ecc_root - 1) * 2))
        |         ELSE ub0 END AS ub1 FROM s1),
        |s3 AS (SELECT *, greatest(lb1, pmax1) AS lb2,
        |         CASE WHEN full1 = 1 AND n_fringe1 <= 32
        |              AND ecc_root - 1 >= 0 THEN 1 ELSE 0 END AS full2
        |       FROM s2),
        |s4 AS (SELECT *, CASE WHEN full2 = 1
        |         THEN least(ub1, greatest(lb2, (ecc_root - 2) * 2))
        |         ELSE ub1 END AS ub2 FROM s3)
        |SELECT CAST(0 AS INT) AS step, CAST(root AS BIGINT) AS root,
        |       CAST(ecc_root AS INT) AS level,
        |       CAST(0 AS BIGINT) AS n_fringe, CAST(0 AS BIGINT) AS n_probed,
        |       CAST(0 AS INT) AS probe_ecc_max,
        |       CAST(lb0 AS INT) AS lb, CAST(ub0 AS INT) AS ub,
        |       CAST(0 AS INT) AS fringe_capped, CAST(exact AS INT) AS exact,
        |       CAST(CASE WHEN ub0 = lb0 THEN exact ELSE 0 END AS INT)
        |         AS certified
        |FROM s4
        |UNION ALL
        |SELECT CAST(1 AS INT), CAST(root AS BIGINT),
        |       CAST(ecc_root AS INT),
        |       CAST(n_fringe0 AS BIGINT),
        |       CAST(least(n_fringe0, 32) AS BIGINT),
        |       CAST(pmax0 AS INT), CAST(lb1 AS INT), CAST(ub1 AS INT),
        |       CAST(1 - full1 AS INT), CAST(exact AS INT),
        |       CAST(CASE WHEN ub1 = lb1 THEN exact ELSE 0 END AS INT)
        |FROM s4
        |UNION ALL
        |SELECT CAST(2 AS INT), CAST(root AS BIGINT),
        |       CAST(ecc_root - 1 AS INT),
        |       CAST(n_fringe1 AS BIGINT),
        |       CAST(least(n_fringe1, 32) AS BIGINT),
        |       CAST(pmax1 AS INT), CAST(lb2 AS INT), CAST(ub2 AS INT),
        |       CAST(1 - full2 AS INT), CAST(exact AS INT),
        |       CAST(CASE WHEN ub2 = lb2 THEN exact ELSE 0 END AS INT)
        |FROM s4
        |ORDER BY step""".stripMargin,
    "q188_graph_hops" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT DISTINCT l.l_suppkey * 2 AS u, o.o_custkey * 2 + 1 AS v
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |adj AS (SELECT u AS src, v AS dst FROM pairs
        |        UNION ALL SELECT v, u FROM pairs),
        |bfs(seed, node, dist) AS (
        |  SELECT seed, seed, 0 FROM (VALUES (2), (3), (4)) s(seed)
        |  UNION
        |  SELECT b.seed, a.dst, b.dist + 1
        |  FROM bfs b JOIN adj a ON a.src = b.node
        |  WHERE b.dist < 3),
        |d AS (SELECT seed, node, MIN(dist) AS dist FROM bfs GROUP BY seed, node)
        |SELECT CAST(seed AS BIGINT) AS seed,
        |       CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'customer' END
        |         AS node_type,
        |       CAST(node // 2 AS BIGINT) AS node_key,
        |       CAST(dist AS INT) AS dist
        |FROM d
        |ORDER BY seed, dist, node_type, node_key""".stripMargin,

    // Six fixed peel rounds with k = max(2, m div n) — both engines run
    // exactly the same six rounds; convergence is spec-checked.
    "q202_kcore" ->
      """WITH it AS MATERIALIZED (SELECT DISTINCT l_orderkey AS oid,
        |              l_partkey AS p FROM lineitem),
        |e0 AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v
        |       FROM it a JOIN it b ON a.oid = b.oid AND a.p < b.p),
        |kk AS (SELECT greatest(2, (2 * (SELECT COUNT(*) FROM e0) //
        |         (SELECT COUNT(*) FROM (SELECT u AS x FROM e0
        |          UNION SELECT v FROM e0) q)) * 11 // 16) AS k),
        |d0 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT u AS node FROM e0 UNION ALL SELECT v AS node FROM e0) q
        |  GROUP BY 1),
        |n0 AS MATERIALIZED (SELECT node FROM d0, kk WHERE deg >= k),
        |e1 AS MATERIALIZED (SELECT u, v FROM e0
        |  WHERE u IN (SELECT node FROM n0)
        |    AND v IN (SELECT node FROM n0)),
        |d1 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT u AS node FROM e1 UNION ALL SELECT v AS node FROM e1) q
        |  GROUP BY 1),
        |n1 AS MATERIALIZED (SELECT node FROM d1, kk WHERE deg >= k),
        |e2 AS MATERIALIZED (SELECT u, v FROM e1
        |  WHERE u IN (SELECT node FROM n1)
        |    AND v IN (SELECT node FROM n1)),
        |d2 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT u AS node FROM e2 UNION ALL SELECT v AS node FROM e2) q
        |  GROUP BY 1),
        |n2 AS MATERIALIZED (SELECT node FROM d2, kk WHERE deg >= k),
        |e3 AS MATERIALIZED (SELECT u, v FROM e2
        |  WHERE u IN (SELECT node FROM n2)
        |    AND v IN (SELECT node FROM n2)),
        |d3 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT u AS node FROM e3 UNION ALL SELECT v AS node FROM e3) q
        |  GROUP BY 1),
        |n3 AS MATERIALIZED (SELECT node FROM d3, kk WHERE deg >= k),
        |e4 AS MATERIALIZED (SELECT u, v FROM e3
        |  WHERE u IN (SELECT node FROM n3)
        |    AND v IN (SELECT node FROM n3)),
        |d4 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT u AS node FROM e4 UNION ALL SELECT v AS node FROM e4) q
        |  GROUP BY 1),
        |n4 AS MATERIALIZED (SELECT node FROM d4, kk WHERE deg >= k),
        |e5 AS MATERIALIZED (SELECT u, v FROM e4
        |  WHERE u IN (SELECT node FROM n4)
        |    AND v IN (SELECT node FROM n4)),
        |d5 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT u AS node FROM e5 UNION ALL SELECT v AS node FROM e5) q
        |  GROUP BY 1),
        |n5 AS MATERIALIZED (SELECT node FROM d5, kk WHERE deg >= k),
        |e6 AS MATERIALIZED (SELECT u, v FROM e5
        |  WHERE u IN (SELECT node FROM n5)
        |    AND v IN (SELECT node FROM n5)),
        |d6 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        |  (SELECT u AS node FROM e6 UNION ALL SELECT v AS node FROM e6) q
        |  GROUP BY 1),
        |stats AS (
        |  SELECT 0 AS round,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM d0) AS n_nodes,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e0) AS n_edges,
        |    COALESCE((SELECT CAST(MIN(deg) AS BIGINT) FROM d0), 0) AS min_deg,
        |    COALESCE((SELECT CAST(MAX(deg) AS BIGINT) FROM d0), 0) AS max_deg
        |  UNION ALL
        |  SELECT 1 AS round,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM d1) AS n_nodes,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e1) AS n_edges,
        |    COALESCE((SELECT CAST(MIN(deg) AS BIGINT) FROM d1), 0) AS min_deg,
        |    COALESCE((SELECT CAST(MAX(deg) AS BIGINT) FROM d1), 0) AS max_deg
        |  UNION ALL
        |  SELECT 2 AS round,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM d2) AS n_nodes,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e2) AS n_edges,
        |    COALESCE((SELECT CAST(MIN(deg) AS BIGINT) FROM d2), 0) AS min_deg,
        |    COALESCE((SELECT CAST(MAX(deg) AS BIGINT) FROM d2), 0) AS max_deg
        |  UNION ALL
        |  SELECT 3 AS round,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM d3) AS n_nodes,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e3) AS n_edges,
        |    COALESCE((SELECT CAST(MIN(deg) AS BIGINT) FROM d3), 0) AS min_deg,
        |    COALESCE((SELECT CAST(MAX(deg) AS BIGINT) FROM d3), 0) AS max_deg
        |  UNION ALL
        |  SELECT 4 AS round,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM d4) AS n_nodes,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e4) AS n_edges,
        |    COALESCE((SELECT CAST(MIN(deg) AS BIGINT) FROM d4), 0) AS min_deg,
        |    COALESCE((SELECT CAST(MAX(deg) AS BIGINT) FROM d4), 0) AS max_deg
        |  UNION ALL
        |  SELECT 5 AS round,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM d5) AS n_nodes,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e5) AS n_edges,
        |    COALESCE((SELECT CAST(MIN(deg) AS BIGINT) FROM d5), 0) AS min_deg,
        |    COALESCE((SELECT CAST(MAX(deg) AS BIGINT) FROM d5), 0) AS max_deg
        |  UNION ALL
        |  SELECT 6 AS round,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM d6) AS n_nodes,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e6) AS n_edges,
        |    COALESCE((SELECT CAST(MIN(deg) AS BIGINT) FROM d6), 0) AS min_deg,
        |    COALESCE((SELECT CAST(MAX(deg) AS BIGINT) FROM d6), 0) AS max_deg
        |)
        |SELECT round, n_nodes, n_edges, min_deg, max_deg,
        |       (SELECT CAST(k AS INT) FROM kk) AS k
        |FROM stats ORDER BY round""".stripMargin,

    // Per-node coreness: the h-index iteration unrolled to the same 24
    // fixed rounds the Spark side runs (fixpoint certified by the
    // c24 = c23 comparison) over the support-2 co-purchase graph.
    "q223_coreness" -> corenessSql,

    // Personalized PageRank: 3 unrolled damped rounds, teleport mass
    // only on the seed brand's parts, per-edge floor division exactly
    // as the operator; top 25 non-seed parts.
    "q225_brand_ppr" ->
      """WITH it AS MATERIALIZED (SELECT DISTINCT l_orderkey AS okey,
        |         l_partkey AS p FROM lineitem),
        |e AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM it a JOIN it b ON a.okey = b.okey AND a.p < b.p),
        |ud AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |deg AS MATERIALIZED (SELECT u, COUNT(*) AS deg FROM ud GROUP BY u),
        |sd AS (SELECT p_partkey AS u FROM part WHERE p_brand = 'Brand#13'),
        |base AS MATERIALIZED (SELECT deg.u,
        |         CASE WHEN sd.u IS NULL THEN 0 ELSE 1 END AS is_seed
        |       FROM deg LEFT JOIN sd ON deg.u = sd.u),
        |r0 AS MATERIALIZED (SELECT u, CAST(is_seed AS BIGINT) * 1000000000000 AS r
        |  FROM base),
        |r1 AS MATERIALIZED (SELECT b.u,
        |    CAST(b.is_seed AS BIGINT) * 150000000000 + COALESCE(c.cs, 0) AS r
        |  FROM base b LEFT JOIN (
        |    SELECT ud.v AS u, CAST(SUM((r0.r*85) // (100*deg.deg)) AS BIGINT) AS cs
        |    FROM ud JOIN r0 ON ud.u = r0.u JOIN deg ON ud.u = deg.u
        |    GROUP BY ud.v) c ON b.u = c.u),
        |r2 AS MATERIALIZED (SELECT b.u,
        |    CAST(b.is_seed AS BIGINT) * 150000000000 + COALESCE(c.cs, 0) AS r
        |  FROM base b LEFT JOIN (
        |    SELECT ud.v AS u, CAST(SUM((r1.r*85) // (100*deg.deg)) AS BIGINT) AS cs
        |    FROM ud JOIN r1 ON ud.u = r1.u JOIN deg ON ud.u = deg.u
        |    GROUP BY ud.v) c ON b.u = c.u),
        |r3 AS MATERIALIZED (SELECT b.u,
        |    CAST(b.is_seed AS BIGINT) * 150000000000 + COALESCE(c.cs, 0) AS r
        |  FROM base b LEFT JOIN (
        |    SELECT ud.v AS u, CAST(SUM((r2.r*85) // (100*deg.deg)) AS BIGINT) AS cs
        |    FROM ud JOIN r2 ON ud.u = r2.u JOIN deg ON ud.u = deg.u
        |    GROUP BY ud.v) c ON b.u = c.u)
        |SELECT CAST(b.u AS BIGINT) AS part, CAST(deg.deg AS BIGINT) AS degree,
        |       CAST(r3.r AS BIGINT) AS rank_units
        |FROM base b JOIN deg ON b.u = deg.u JOIN r3 ON b.u = r3.u
        |WHERE b.is_seed = 0
        |ORDER BY rank_units DESC, part
        |LIMIT 25""".stripMargin,

    // Per-node local clustering over the support-2 co-purchase graph:
    // the q142 oriented census with each surviving triangle exploded to
    // its three members before a node-keyed count; exact floor ppm.
    "q229_local_clustering" ->
      """WITH it AS MATERIALIZED (SELECT DISTINCT l_orderkey AS oid,
        |         l_partkey AS item FROM lineitem),
        |e AS MATERIALIZED (SELECT a.item AS u, b.item AS v
        |  FROM it a JOIN it b ON a.oid = b.oid AND a.item < b.item
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |deg AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM (
        |    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) z
        |  GROUP BY node),
        |o AS (SELECT
        |        CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v
        |        END AS s,
        |        CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u
        |        END AS t
        |      FROM e JOIN deg du ON e.u = du.node
        |             JOIN deg dv ON e.v = dv.node),
        |tri AS (SELECT o1.s AS s, o1.t AS u, o2.t AS v
        |        FROM o o1 JOIN o o2 ON o1.s = o2.s AND o1.t < o2.t
        |        WHERE EXISTS (SELECT 1 FROM e
        |                      WHERE e.u = o1.t AND e.v = o2.t)),
        |pn AS (SELECT node, COUNT(*) AS t FROM (
        |    SELECT s AS node FROM tri UNION ALL SELECT u FROM tri
        |    UNION ALL SELECT v FROM tri) z GROUP BY node)
        |SELECT CAST(deg.node AS BIGINT) AS part,
        |       CAST(deg.deg AS BIGINT) AS degree,
        |       CAST(COALESCE(pn.t, 0) AS BIGINT) AS n_triangles,
        |       CAST(CASE WHEN deg.deg < 2 THEN 0
        |            ELSE 2 * COALESCE(pn.t, 0) * 1000000
        |                 // (deg.deg * (deg.deg - 1)) END AS BIGINT)
        |         AS lcc_ppm
        |FROM deg LEFT JOIN pn ON deg.node = pn.node
        |ORDER BY part""".stripMargin,

    // Degree assortativity over the support->=2 co-purchase graph:
    // exact integer sufficient statistics, one double sqrt on the
    // 1-row relation, round-e6.
    "q253_assortativity" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS oid, l_partkey AS item
        |            FROM lineitem),
        |prx AS (SELECT a.item AS u, b.item AS v
        |        FROM it a JOIN it b ON a.oid = b.oid AND a.item < b.item
        |        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |dg AS (SELECT n, COUNT(*) AS d FROM (
        |    SELECT u AS n FROM prx UNION ALL SELECT v FROM prx) z
        |  GROUP BY n),
        |nn AS (SELECT COUNT(*) AS n_nodes, MAX(d) AS max_degree FROM dg),
        |dd AS (SELECT u, v FROM prx UNION ALL SELECT v, u FROM prx),
        |sums AS (SELECT COUNT(*) AS m2,
        |    SUM(CAST(dx.d AS HUGEINT)) AS sx,
        |    SUM(CAST(dy.d AS HUGEINT)) AS sy,
        |    SUM(CAST(dx.d AS HUGEINT) * dy.d) AS sxy,
        |    SUM(CAST(dx.d AS HUGEINT) * dx.d) AS sxx,
        |    SUM(CAST(dy.d AS HUGEINT) * dy.d) AS syy
        |  FROM dd JOIN dg dx ON dd.u = dx.n JOIN dg dy ON dd.v = dy.n),
        |fin AS (SELECT *, m2 * sxy - sx * sy AS num,
        |          m2 * sxx - sx * sx AS d1, m2 * syy - sy * sy AS d2
        |        FROM sums CROSS JOIN nn)
        |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
        |       CAST(m2 // 2 AS BIGINT) AS n_edges,
        |       CAST(max_degree AS BIGINT) AS max_degree,
        |       CAST(CASE WHEN d1 > 0 AND d2 > 0
        |            THEN round(CAST(num AS DOUBLE)
        |              / sqrt(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE))
        |              * 1e6, 0)
        |            ELSE 0 END AS BIGINT) AS assortativity_e6,
        |       CAST(CASE WHEN d1 > 0 AND d2 > 0 THEN 1 ELSE 0 END AS INT)
        |         AS defined
        |FROM fin""".stripMargin,

    // Adamic-Adar link prediction: hub-capped common-neighbor pairs,
    // round-e6 1/ln(deg) weights, anti join on existing edges, top-25.
    "q257_link_prediction" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS oid, l_partkey AS item
        |            FROM lineitem),
        |prx AS (SELECT a.item AS u, b.item AS v
        |        FROM it a JOIN it b ON a.oid = b.oid AND a.item < b.item
        |        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |dirx AS (SELECT u, v FROM prx UNION ALL SELECT v, u FROM prx),
        |dg AS (SELECT u AS z, COUNT(*) AS d FROM dirx GROUP BY u),
        |ctr AS (SELECT z, CAST(round(1e6 / ln(CAST(d AS DOUBLE)), 0)
        |          AS BIGINT) AS w_e6
        |        FROM dg WHERE d BETWEEN 2 AND 64),
        |adjx AS (SELECT d2.u AS z, d2.v AS nb, ctr.w_e6
        |         FROM dirx d2 JOIN ctr ON ctr.z = d2.u),
        |prs AS (SELECT x.z, x.nb AS a, y.nb AS b, x.w_e6
        |        FROM adjx x JOIN adjx y ON x.z = y.z AND x.nb < y.nb),
        |nonadj AS (SELECT prs.* FROM prs
        |           LEFT JOIN prx e ON e.u = prs.a AND e.v = prs.b
        |           WHERE e.u IS NULL),
        |sc AS (SELECT a, b, CAST(SUM(w_e6) AS BIGINT) AS aa_e6,
        |         CAST(COUNT(*) AS BIGINT) AS n_common
        |       FROM nonadj GROUP BY a, b)
        |SELECT a, b, aa_e6, n_common
        |FROM sc ORDER BY aa_e6 DESC, a, b LIMIT 25""".stripMargin,

    // LPA communities + modularity (generated — see lpaSql).
    "q263_lpa_communities" -> lpaSql,

    // HITS hubs/authorities (generated — see hitsSql).
    "q264_hits" -> hitsSql,

    // Sampled betweenness (generated — see betweennessSql).
    "q274_betweenness" -> betweennessSql,

    // LPA community conductance (generated — see conductanceSql).
    "q279_conductance" -> conductanceSql,
  )
}
