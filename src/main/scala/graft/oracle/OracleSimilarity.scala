package graft.oracle

import graft.oracle.OracleDialect._

/** DuckDB oracle SQL — similarity tier
  * (30 queries). Values are verbatim from SparkEntry.scala
  * (round-11 mechanical split); SparkEntry.oracleSql concatenates the
  * domain maps, and QueriesSpec pins key-set equality (both directions) with the
  * query registry. */
object OracleSimilarity {
  /** RBO@10 depth weights over the 2520·10¹⁰ common denominator — the
    * same Scala constants the operator uses (Retrieval.rboWeight). */
  private val rboWtValues: String = (1 to 10)
    .map(d => s"($d, ${graft.ext.Retrieval.rboWeight(d, 10)})")
    .mkString(", ")
  private val rboDenMin: String =
    (BigInt(2520) * BigInt(10).pow(10)).toString
  private val rboDenNorm: String =
    (BigInt(2520) * (BigInt(10).pow(10) - BigInt(9).pow(10))).toString

  /** nDCG@3 depth discounts — the same Scala constants the operator
    * uses (Retrieval.ndcgDiscountE6). */
  private val ndcgDiscValues: String = (1 to 3)
    .map(d => s"($d, ${graft.ext.Retrieval.ndcgDiscountE6(d)})")
    .mkString(", ")

  /** The q245 power recursion unrolled over quantized relation `src`
    * (vec_id, i, q): CTEs v{tag}0 (all-e4 init) … v{tag}R. Mirrors
    * Similarity.powerLoop. Every round output is MATERIALIZED: DuckDB
    * 1.0 inlines multiply-referenced CTEs, so an unmaterialized chain
    * re-evaluates its whole upstream per reference — exponential in the
    * round count (measured: q282 unmaterialized ran 15+ min at sf0.01;
    * materialized, seconds). */
  private def powerRoundsCtes(src: String, tag: String, rounds: Int): String = {
    val init = s"""v${tag}0 AS MATERIALIZED (
                  |       SELECT DISTINCT i, CAST(10000 AS BIGINT) AS v
                  |       FROM $src)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""s$tag$r AS (SELECT vec_id, CAST(SUM(q * v) AS BIGINT) AS s
         |       FROM $src JOIN v$tag${r - 1} USING (i) GROUP BY vec_id),
         |w$tag$r AS (SELECT i, SUM(CAST(q AS HUGEINT) * s) AS w
         |       FROM $src JOIN s$tag$r USING (vec_id) GROUP BY i),
         |m$tag$r AS (SELECT MAX(abs(w)) AS m FROM w$tag$r),
         |v$tag$r AS MATERIALIZED (
         |       SELECT i, CAST(CASE WHEN w >= 0 THEN (abs(w)*10000)//m
         |              ELSE -((abs(w)*10000)//m) END AS BIGINT) AS v
         |       FROM w$tag$r CROSS JOIN m$tag$r)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }

  /** The q267/q280 two-table sign-LSH seed graph as a CTE chain ending
    * at `sd` (the seeded best-5 edges). */
  private val knnSeedCtes: String =
    s"""bk AS (SELECT vec_id, emb, nrm,
       |    (CASE WHEN list_dot_product(emb, ${planeLit(0)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeLit(1)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeLit(2)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeLit(3)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS b1,
       |    (CASE WHEN list_dot_product(emb, ${planeRowLit(4)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeRowLit(5)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeRowLit(6)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeRowLit(7)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS b2
       |  FROM nm),
       |sp AS (SELECT x.vec_id AS id, y.vec_id AS nid,
       |         ROUND(list_dot_product(x.emb, y.emb)/(x.nrm*y.nrm), 4) AS score
       |       FROM bk x JOIN bk y
       |         ON x.b1 = y.b1 AND x.vec_id <> y.vec_id
       |       UNION
       |       SELECT x.vec_id, y.vec_id,
       |         ROUND(list_dot_product(x.emb, y.emb)/(x.nrm*y.nrm), 4)
       |       FROM bk x JOIN bk y
       |         ON x.b2 = y.b2 AND x.vec_id <> y.vec_id),
       |sd AS MATERIALIZED (
       |       SELECT id, nid FROM (SELECT *, row_number() OVER (
       |           PARTITION BY id ORDER BY score DESC, nid) AS rk FROM sp) z
       |       WHERE rk <= 5)""".stripMargin

  /** One NN-descent round as CTEs: graph `prev` (id, nid) → graph `cur`
    * — undirected expansion, two-hop candidates, exact rescore vs `nm`,
    * best-5. Mirrors Similarity.descentRound; CTE names are prefixed so
    * unrolled rounds compose (q280). Round outputs (and the undirected
    * expansion, read twice by the two-hop join) are MATERIALIZED — the
    * DuckDB 1.0 inlining trap (see powerRoundsCtes): the unmaterialized
    * 3-round q280 chain effectively hung the sf0.1 gate on 2000
    * nodes. */
  private def knnRoundCtes(prev: String, cur: String, p: String): String =
    s"""ud$p AS MATERIALIZED (
       |       SELECT id, nid FROM $prev UNION SELECT nid, id FROM $prev),
       |c2$p AS (SELECT a.id, b.nid FROM ud$p a JOIN ud$p b ON b.id = a.nid
       |       WHERE b.nid <> a.id),
       |ca$p AS (SELECT id, nid FROM $prev UNION SELECT id, nid FROM c2$p),
       |rs$p AS (SELECT ca$p.id, ca$p.nid,
       |         ROUND(list_dot_product(x.emb, y.emb)/(x.nrm*y.nrm), 4) AS score
       |       FROM ca$p JOIN nm x ON x.vec_id = ca$p.id
       |       JOIN nm y ON y.vec_id = ca$p.nid),
       |$cur AS MATERIALIZED (
       |       SELECT id, nid FROM (SELECT *, row_number() OVER (
       |           PARTITION BY id ORDER BY score DESC, nid) AS rk FROM rs$p) z
       |       WHERE rk <= 5)""".stripMargin

  /** The q267 two-table-seed + one-descent k-NN graph as a CTE chain
    * ending at `ds` (the descent edges) — shared verbatim by the q267
    * recall report and the q276 label-noise probe. */
  private val knnDescentCtes: String =
    knnSeedCtes + ",\n" + knnRoundCtes("sd", "ds", "")

  /** q280: the per-round report legs — one SELECT per round over the
    * unrolled graphs g0(=sd), g1..gR. */
  private def knnTrajectorySql(rounds: Int): String = {
    val roundBlocks = (1 to rounds).map { r =>
      knnRoundCtes(if (r == 1) "sd" else s"g${r - 1}", s"g$r", s"_$r")
    }.mkString(",\n")
    val stageRows = (0 to rounds).map { r =>
      val g = if (r == 0) "sd" else s"g$r"
      val fresh =
        if (r == 0) s"(SELECT COUNT(*) FROM sd)"
        else {
          val prev = if (r == 1) "sd" else s"g${r - 1}"
          s"""(SELECT COUNT(*) FROM (SELECT id, nid FROM $g
             |      EXCEPT SELECT id, nid FROM $prev) x$r)""".stripMargin
        }
      s"""SELECT $r AS round,
         |  (SELECT COUNT(DISTINCT id) FROM $g) AS n_nodes,
         |  (SELECT COUNT(*) FROM $g) AS n_edges,
         |  $fresh AS n_new_edges,
         |  (SELECT COUNT(*) FROM ek) AS n_exact,
         |  (SELECT COUNT(*) FROM ek JOIN $g USING (id, nid)) AS n_hit""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $embCte,
       |$knnSeedCtes,
       |$roundBlocks,
       |pb AS (SELECT vec_id AS pid, emb, nrm FROM nm WHERE vec_id < 64),
       |ex AS (SELECT pb.pid AS id, c.vec_id AS nid,
       |         ROUND(list_dot_product(pb.emb, c.emb)/(pb.nrm*c.nrm), 4)
       |           AS score
       |       FROM nm c CROSS JOIN pb WHERE c.vec_id <> pb.pid),
       |ek AS MATERIALIZED (
       |       SELECT id, nid FROM (SELECT *, row_number() OVER (
       |           PARTITION BY id ORDER BY score DESC, nid) AS rk FROM ex) z
       |       WHERE rk <= 5),
       |st AS ($stageRows)
       |SELECT CAST(round AS INT) AS round,
       |       CAST(n_nodes AS BIGINT) AS n_nodes,
       |       CAST(n_edges AS BIGINT) AS n_edges,
       |       CAST(n_new_edges AS BIGINT) AS n_new_edges,
       |       CAST(n_exact AS BIGINT) AS n_exact,
       |       CAST(n_hit AS BIGINT) AS n_hit,
       |       CAST(CASE WHEN n_exact = 0 THEN 0
       |            ELSE n_hit * 1000000 // n_exact END AS BIGINT)
       |         AS recall_ppm,
       |       CAST(CASE WHEN round > 0 AND n_new_edges = 0 THEN 1 ELSE 0 END
       |         AS INT) AS converged
       |FROM st
       |ORDER BY round""".stripMargin
  }

  /** q304: the graph-ANN SERVING walk over the q280 3-round descent
    * graph, unrolled — undirected degree-capped serve edges, the fixed
    * `nEntry`-smallest-id entry set, `hops` synchronous beam hops
    * (beam = top-`beam` of the visited set, expand through serve edges,
    * score only genuinely new candidates, union), final top-`k` with
    * exact-brute-tier hit flags and the visited-set size. Every
    * multiply-referenced CTE is MATERIALIZED (the DuckDB inlining trap
    * — see powerRoundsCtes). */
  /** The walk's shared substrate: the unrolled descent graph, the
    * degree-capped undirected serve edges `sv`, the query set `qs`, the
    * per-query hierarchical entry set `en` (IVF-centroid coarse layer:
    * each query's `nprobe` nearest q49-centroids, entered at each
    * probed cell's nEntry/nprobe most-central members — mirrors the
    * engine's r15 entry), and the exact top-k `ek` — beam-INDEPENDENT,
    * so the q310 sweep unrolls several walks over one copy. */
  private def graphAnnBaseCtes(graphRounds: Int, k: Int, nEntry: Int,
                               nprobe: Int = 2): String = {
    val roundBlocks = (1 to graphRounds).map { r =>
      knnRoundCtes(if (r == 1) "sd" else s"g${r - 1}", s"g$r", s"_$r")
    }.mkString(",\n")
    val gN = s"g$graphRounds"
    val perCell = nEntry / nprobe
    s"""$embCte,
       |$knnSeedCtes,
       |$roundBlocks,
       |ud AS (SELECT id, nid FROM $gN UNION SELECT nid, id FROM $gN),
       |sv0 AS (SELECT ud.id, ud.nid,
       |         ROUND(list_dot_product(x.emb, y.emb)/(x.nrm*y.nrm), 4)
       |           AS escore
       |       FROM ud JOIN nm x ON x.vec_id = ud.id
       |       JOIN nm y ON y.vec_id = ud.nid),
       |sv AS MATERIALIZED (
       |       SELECT id, nid FROM (SELECT *, row_number() OVER (
       |           PARTITION BY id ORDER BY escore DESC, nid) AS rk FROM sv0) z
       |       WHERE rk <= ${2 * k}),
       |qs AS MATERIALIZED (
       |       SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm
       |       FROM nm WHERE vec_id < 10),
       |cx AS (SELECT label AS cell, g AS pos,
       |         CAST(embedding[g] AS DOUBLE) AS v
       |       FROM (SELECT label, embedding,
       |               unnest(range(1, len(embedding)+1)) AS g
       |             FROM embeddings) z),
       |ccs AS (SELECT cell, pos,
       |          CAST(SUM(CAST(ROUND(v*10000,0) AS BIGINT)) AS BIGINT) AS s,
       |          COUNT(*) AS n
       |        FROM cx GROUP BY cell, pos),
       |cn AS (SELECT cell, centroid,
       |         sqrt(list_dot_product(centroid, centroid)) AS cnrm
       |       FROM (SELECT cell,
       |               LIST(CAST(s AS DOUBLE)/10000.0/n ORDER BY pos)
       |                 AS centroid
       |             FROM ccs GROUP BY cell) zz),
       |pr AS (SELECT query_id, cell FROM (SELECT *, row_number() OVER (
       |           PARTITION BY query_id ORDER BY pscore DESC, cell) AS rk
       |         FROM (SELECT qs.query_id, cn.cell,
       |                 ROUND(list_dot_product(qs.q_emb, cn.centroid)
       |                   /(qs.q_nrm*cn.cnrm), 4) AS pscore
       |               FROM qs CROSS JOIN cn) p) z
       |       WHERE rk <= $nprobe),
       |en AS MATERIALIZED (
       |       SELECT query_id, nid FROM (SELECT *, row_number() OVER (
       |           PARTITION BY query_id, cell
       |           ORDER BY escore DESC, nid) AS rk
       |         FROM (SELECT pr.query_id, pr.cell, nm.vec_id AS nid,
       |                 ROUND(list_dot_product(qs.q_emb, nm.emb)
       |                   /(qs.q_nrm*nm.nrm), 4) AS escore
       |               FROM pr JOIN qs USING (query_id)
       |               JOIN nm ON nm.label = pr.cell) e) z
       |       WHERE rk <= $perCell),
       |exq AS (SELECT qs.query_id, c.vec_id AS nid,
       |         ROUND(list_dot_product(qs.q_emb, c.emb)/(qs.q_nrm*c.nrm), 4)
       |           AS score
       |       FROM nm c CROSS JOIN qs WHERE c.vec_id <> qs.query_id),
       |ek AS MATERIALIZED (
       |       SELECT query_id, nid FROM (SELECT *, row_number() OVER (
       |           PARTITION BY query_id ORDER BY score DESC, nid) AS rk
       |         FROM exq) z
       |       WHERE rk <= $k)""".stripMargin
  }

  /** One unrolled beam walk over the base CTEs, all names prefixed by
    * `p` so several beam widths compose in one statement (p = "" yields
    * the q304 names). */
  private def graphAnnWalkCtes(p: String, hops: Int, beam: Int): String = {
    val hopBlocks = (1 to hops).map { h =>
      val prev = s"v$p${h - 1}"
      s"""b$p$h AS (SELECT query_id, nid AS id FROM (SELECT *, row_number() OVER (
         |           PARTITION BY query_id ORDER BY score DESC, nid) AS rk
         |         FROM $prev) z WHERE rk <= $beam),
         |e$p$h AS (SELECT DISTINCT b$p$h.query_id, sv.nid
         |       FROM b$p$h JOIN sv ON sv.id = b$p$h.id),
         |n$p$h AS (SELECT e$p$h.query_id, e$p$h.nid FROM e$p$h
         |       LEFT JOIN $prev p
         |         ON p.query_id = e$p$h.query_id AND p.nid = e$p$h.nid
         |       WHERE p.nid IS NULL),
         |v$p$h AS MATERIALIZED (
         |       SELECT query_id, nid, score FROM $prev
         |       UNION ALL
         |       SELECT n$p$h.query_id, n$p$h.nid,
         |         ROUND(list_dot_product(qs.q_emb, y.emb)/(qs.q_nrm*y.nrm), 4)
         |       FROM n$p$h JOIN qs USING (query_id)
         |       JOIN nm y ON y.vec_id = n$p$h.nid)""".stripMargin
    }.mkString(",\n")
    s"""v${p}0 AS MATERIALIZED (
       |       SELECT qs.query_id, en.nid,
       |         ROUND(list_dot_product(qs.q_emb, y.emb)/(qs.q_nrm*y.nrm), 4)
       |           AS score
       |       FROM en JOIN qs USING (query_id)
       |       JOIN nm y ON y.vec_id = en.nid),
       |$hopBlocks""".stripMargin
  }

  private def graphAnnSql(graphRounds: Int, hops: Int, k: Int, beam: Int,
                          nEntry: Int): String =
    s"""WITH ${graphAnnBaseCtes(graphRounds, k, nEntry)},
       |${graphAnnWalkCtes("", hops, beam)},
       |nv AS (SELECT query_id, COUNT(*) AS n_visited FROM v$hops
       |       GROUP BY query_id),
       |fin AS (SELECT query_id, nid, score, row_number() OVER (
       |           PARTITION BY query_id ORDER BY score DESC, nid) AS rnk
       |       FROM v$hops WHERE nid <> query_id)
       |SELECT f.query_id, CAST(f.rnk AS INT) AS rank,
       |       f.nid AS neighbor_id, f.score AS score,
       |       CAST(CASE WHEN ek.nid IS NOT NULL THEN 1 ELSE 0 END AS INT)
       |         AS is_hit,
       |       CAST(nv.n_visited AS BIGINT) AS n_visited
       |FROM fin f
       |LEFT JOIN ek ON ek.query_id = f.query_id AND ek.nid = f.nid
       |JOIN nv ON nv.query_id = f.query_id
       |WHERE f.rnk <= $k
       |ORDER BY f.query_id, f.rnk""".stripMargin

  /** q310: several beam widths walked over ONE shared substrate, each
    * rolled up to (beam, query count, total visited volume, exact-tier
    * hits, results, recall ppm). */
  private def graphAnnSweepSql(graphRounds: Int, hops: Int, k: Int,
                               beams: Seq[Int], nEntry: Int): String = {
    val tagged = beams.sorted.zipWithIndex.map { case (b, i) =>
      (('a' + i).toChar.toString, b)
    }
    val walks = tagged.map { case (p, b) =>
      graphAnnWalkCtes(p, hops, b)
    }.mkString(",\n")
    val legs = tagged.map { case (p, b) =>
      s"""nv$p AS (SELECT query_id, COUNT(*) AS nv FROM v$p$hops
         |       GROUP BY query_id),
         |fin$p AS (SELECT query_id, nid, score, row_number() OVER (
         |           PARTITION BY query_id ORDER BY score DESC, nid) AS rnk
         |       FROM v$p$hops WHERE nid <> query_id),
         |hh$p AS (SELECT f.query_id, COUNT(*) AS nr,
         |           SUM(CASE WHEN ek.nid IS NOT NULL THEN 1 ELSE 0 END) AS h
         |       FROM fin$p f
         |       LEFT JOIN ek ON ek.query_id = f.query_id AND ek.nid = f.nid
         |       WHERE f.rnk <= $k GROUP BY 1),
         |ag$p AS (SELECT CAST($b AS INT) AS beam,
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM nv$p) AS n_queries,
         |         (SELECT CAST(SUM(nv) AS BIGINT) FROM nv$p)
         |           AS n_visited_total,
         |         (SELECT CAST(SUM(h) AS BIGINT) FROM hh$p) AS n_hits,
         |         (SELECT CAST(SUM(nr) AS BIGINT) FROM hh$p) AS n_results)""".stripMargin
    }.mkString(",\n")
    val union = tagged.map { case (p, _) => s"SELECT * FROM ag$p" }
      .mkString("\nUNION ALL ")
    s"""WITH ${graphAnnBaseCtes(graphRounds, k, nEntry)},
       |$walks,
       |$legs
       |SELECT beam, n_queries, n_visited_total, n_hits, n_results,
       |       CAST(CASE WHEN n_queries = 0 THEN 0
       |         ELSE n_hits * 1000000 // (n_queries * $k) END AS BIGINT)
       |         AS recall_ppm
       |FROM ($union)
       |ORDER BY beam""".stripMargin
  }

  /** The flat-index BM25 ranking over the shared q186 query set —
    * served under BOTH q186 (the flat operator) and q286 (whose Spark
    * side ranks on merged per-half index states; flat-vs-merged hash
    * equality is the monoid proof). */
  private val bm25FlatSql: String =
    s"""WITH $nCte, $tokCte,
       |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
       |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
       |dft AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
       |tot AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM dl),
       |q(query_id, w) AS (VALUES
       |  (1, 'spark'), (1, 'hash'), (1, 'join'),
       |  (2, 'window'), (2, 'merge'), (2, 'sort'),
       |  (3, 'stream'), (3, 'batch'), (3, 'data')),
       |qi AS (SELECT q.query_id, q.w,
       |         CAST(round(ln(1 + (n - df + 0.5) / (df + 0.5)) * 1e6, 0)
       |              AS BIGINT) AS idf_micro
       |       FROM q JOIN dft USING (w) CROSS JOIN tot),
       |sc AS (SELECT qi.query_id, tf.doc_id,
       |         CAST(SUM(qi.idf_micro *
       |           CAST(CAST(22 AS HUGEINT) * tf.tf * t * 1000000 //
       |                (CAST(10 AS HUGEINT) * t * tf.tf + 3 * t + 9 * dl.dl * n)
       |                AS BIGINT)) AS BIGINT) AS score_e12,
       |         CAST(COUNT(*) AS INT) AS n_hit_terms
       |       FROM qi JOIN tf USING (w) JOIN dl USING (doc_id)
       |            CROSS JOIN tot
       |       GROUP BY qi.query_id, tf.doc_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY score_e12 DESC, doc_id) AS rnk FROM sc)
       |SELECT query_id, CAST(rnk AS INT) AS rank, doc_id, score_e12,
       |       n_hit_terms
       |FROM rk WHERE rnk <= 10
       |ORDER BY query_id, rank""".stripMargin

  private[graft] val sql: Map[String, String] = Map(
    // Margin-based mutual-kNN alignment mining: e4-quantized cosines,
    // sign-split floor divisions for the kNN averages and margins
    // (cosines go negative), best pair via the (margin DESC, id_a,
    // id_b) window — identical winner to Spark's min_by struct.
    "q298_margin_alignment" ->
      s"""WITH $embCte,
         |sv AS (SELECT nm.vec_id, nm.label AS bucket, nm.emb, nm.nrm,
         |         d.source
         |       FROM nm JOIN documents d ON nm.vec_id = d.doc_id),
         |pr AS (SELECT a.source AS src_a, a.vec_id AS id_a,
         |         b.source AS src_b, b.vec_id AS id_b,
         |         CAST(ROUND(list_dot_product(a.emb, b.emb)
         |           / (a.nrm * b.nrm) * 10000, 0) AS BIGINT) AS cos_e4
         |       FROM sv a JOIN sv b
         |         ON a.bucket = b.bucket AND a.source < b.source),
         |dr AS (SELECT id_a AS qid, src_a AS qsrc, src_b AS oth,
         |         id_b AS nid, cos_e4 FROM pr
         |       UNION ALL
         |       SELECT id_b, src_b, src_a, id_a, cos_e4 FROM pr),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY qid, oth
         |         ORDER BY cos_e4 DESC, nid) AS rk FROM dr),
         |r3 AS (SELECT * FROM rk WHERE rk <= 3),
         |av AS (SELECT qid, oth,
         |         CAST(CASE WHEN SUM(cos_e4) < 0
         |           THEN -((-SUM(cos_e4)) // COUNT(*))
         |           ELSE SUM(cos_e4) // COUNT(*) END AS BIGINT) AS avg_e4
         |       FROM r3 GROUP BY 1, 2),
         |n1 AS (SELECT qid, qsrc, oth, nid, cos_e4 FROM r3 WHERE rk = 1),
         |mu AS (SELECT x.qsrc AS src_a, x.oth AS src_b, x.qid AS id_a,
         |         x.nid AS id_b, x.cos_e4
         |       FROM n1 x JOIN n1 y
         |         ON x.nid = y.qid AND x.qsrc = y.oth AND y.nid = x.qid
         |       WHERE x.qsrc < x.oth),
         |mg AS (SELECT mu.src_a, mu.src_b, mu.id_a, mu.id_b,
         |         CAST(CASE WHEN aa.avg_e4 + ab.avg_e4 <= 0 THEN 0
         |           WHEN mu.cos_e4 < 0 THEN
         |             -(((-mu.cos_e4) * 2000000) // (aa.avg_e4 + ab.avg_e4))
         |           ELSE (mu.cos_e4 * 2000000) // (aa.avg_e4 + ab.avg_e4)
         |           END AS BIGINT) AS margin_ppm
         |       FROM mu JOIN av aa ON aa.qid = mu.id_a AND aa.oth = mu.src_b
         |            JOIN av ab ON ab.qid = mu.id_b AND ab.oth = mu.src_a),
         |mr AS (SELECT *, row_number() OVER (PARTITION BY src_a, src_b
         |         ORDER BY margin_ppm DESC, id_a, id_b) AS brk FROM mg),
         |ag AS (SELECT src_a, src_b,
         |         CAST(COUNT(*) AS BIGINT) AS n_mutual,
         |         CAST(SUM(CASE WHEN margin_ppm >= 1020000 THEN 1 ELSE 0
         |           END) AS BIGINT) AS n_aligned
         |       FROM mg GROUP BY 1, 2),
         |bp AS (SELECT src_a, src_b, margin_ppm AS best_margin_ppm,
         |         id_a AS best_id_a, id_b AS best_id_b
         |       FROM mr WHERE brk = 1),
         |cs AS (SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT)
         |         AS n_candidates FROM pr GROUP BY 1, 2)
         |SELECT cs.src_a, cs.src_b, cs.n_candidates,
         |       COALESCE(ag.n_mutual, 0) AS n_mutual,
         |       COALESCE(ag.n_aligned, 0) AS n_aligned,
         |       COALESCE(bp.best_margin_ppm, 0) AS best_margin_ppm,
         |       COALESCE(bp.best_id_a, -1) AS best_id_a,
         |       COALESCE(bp.best_id_b, -1) AS best_id_b
         |FROM cs LEFT JOIN ag ON cs.src_a = ag.src_a AND cs.src_b = ag.src_b
         |        LEFT JOIN bp ON cs.src_a = bp.src_a AND cs.src_b = bp.src_b
         |ORDER BY cs.src_a, cs.src_b""".stripMargin,
    "q36_embed_near_dup" ->
      s"""WITH $embCte
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS bucket,
         |       ROUND(list_dot_product(a.emb, b.emb)/(a.nrm*b.nrm), 4) AS cos
         |FROM nm a JOIN nm b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ROUND(list_dot_product(a.emb, b.emb)/(a.nrm*b.nrm), 4) >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,
    "q37_ann_brute_topk" -> annBruteSql,
    "q38_ann_lsh_topk" -> annLshSql,
    "q49_ann_ivf_topk" -> annIvfSql,
    "q76_kmeans_step" ->
      s"""WITH $embCte,
         |ex AS (SELECT label AS cell, g AS pos, CAST(embedding[g] AS DOUBLE) AS v
         |       FROM (SELECT label, embedding, unnest(range(1, len(embedding)+1)) AS g
         |             FROM embeddings) z),
         |cs AS (SELECT cell, pos, CAST(SUM(CAST(ROUND(v*10000,0) AS BIGINT)) AS BIGINT) AS s,
         |              COUNT(*) AS n
         |       FROM ex GROUP BY cell, pos),
         |cent AS (SELECT cell, LIST(CAST(s AS DOUBLE)/10000.0/n ORDER BY pos) AS centroid
         |         FROM cs GROUP BY cell),
         |cn AS (SELECT cell, centroid, sqrt(list_dot_product(centroid, centroid)) AS cnrm
         |       FROM cent),
         |sc AS (SELECT v.vec_id, v.emb, v.label AS old_cell, cn.cell,
         |              ROUND(list_dot_product(v.emb, cn.centroid)/(v.nrm*cn.cnrm), 4) AS score
         |       FROM nm v CROSS JOIN cn),
         |asg AS (SELECT vec_id, emb, old_cell, cell FROM sc
         |        QUALIFY row_number() OVER (PARTITION BY vec_id
         |          ORDER BY score DESC, cell) = 1),
         |ex2 AS (SELECT cell, g AS pos, emb[g] AS v
         |        FROM (SELECT cell, emb, unnest(range(1, len(emb)+1)) AS g FROM asg) z),
         |cs2 AS (SELECT cell, pos, CAST(SUM(CAST(ROUND(v*10000,0) AS BIGINT)) AS BIGINT) AS s,
         |               COUNT(*) AS n
         |        FROM ex2 GROUP BY cell, pos),
         |cent2 AS (SELECT cell, LIST(CAST(s AS DOUBLE)/10000.0/n ORDER BY pos) AS nc
         |          FROM cs2 GROUP BY cell),
         |sz AS (SELECT cell, COUNT(*) AS n_assigned,
         |              CAST(SUM(CASE WHEN old_cell = cell THEN 1 ELSE 0 END) AS BIGINT)
         |                AS n_stayed
         |       FROM asg GROUP BY cell)
         |SELECT cn.cell, sz.n_assigned, sz.n_stayed,
         |       ROUND(list_dot_product(cn.centroid, c2.nc) /
         |         (sqrt(list_dot_product(cn.centroid, cn.centroid)) *
         |          sqrt(list_dot_product(c2.nc, c2.nc))), 4) AS centroid_cos
         |FROM cn
         |JOIN cent2 c2 ON cn.cell = c2.cell
         |JOIN sz ON sz.cell = cn.cell
         |ORDER BY cn.cell""".stripMargin,
    // Both sides are the q37/q38 CTEs verbatim (rounded score is the
    // ranking key on both engines) cut to top-3; recall divides exact
    // hit counts with fixed-point floor division.
    "q105_ann_recall" ->
      s"""WITH $embCte,
         |q AS (SELECT * FROM nm WHERE vec_id < 10),
         |bsc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |               ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) AS score
         |        FROM nm c CROSS JOIN q WHERE c.vec_id <> q.vec_id),
         |br AS (SELECT query_id, neighbor_id FROM (
         |         SELECT query_id, neighbor_id,
         |                row_number() OVER (PARTITION BY query_id
         |                  ORDER BY score DESC, neighbor_id) AS rnk
         |         FROM bsc) WHERE rnk <= 3),
         |bk AS (SELECT vec_id, emb, nrm,
         |    (CASE WHEN list_dot_product(emb, ${planeLit(0)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(1)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(2)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(3)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS bucket
         |  FROM nm),
         |lq AS (SELECT * FROM bk WHERE vec_id < 10),
         |lsc AS (SELECT lq.vec_id AS query_id, c.vec_id AS neighbor_id,
         |               ROUND(list_dot_product(lq.emb, c.emb)/(lq.nrm*c.nrm), 4) AS score
         |        FROM bk c JOIN lq ON c.bucket = lq.bucket AND c.vec_id <> lq.vec_id),
         |ls AS (SELECT query_id, neighbor_id FROM (
         |         SELECT query_id, neighbor_id,
         |                row_number() OVER (PARTITION BY query_id
         |                  ORDER BY score DESC, neighbor_id) AS rnk
         |         FROM lsc) WHERE rnk <= 3),
         |hits AS (SELECT b.query_id, COUNT(*) AS n_hit FROM br b
         |         WHERE EXISTS (SELECT 1 FROM ls l
         |                       WHERE l.query_id = b.query_id
         |                         AND l.neighbor_id = b.neighbor_id)
         |         GROUP BY b.query_id),
         |ke AS (SELECT query_id, COUNT(*) AS k_eff FROM br GROUP BY query_id)
         |SELECT ke.query_id, CAST(ke.k_eff AS INT) AS k_eff,
         |       COALESCE(h.n_hit, 0) AS n_hit,
         |       CAST((COALESCE(h.n_hit, 0) * 1000000) // ke.k_eff AS DOUBLE)/1000000.0 AS recall
         |FROM ke LEFT JOIN hits h ON ke.query_id = h.query_id
         |ORDER BY ke.query_id""".stripMargin,
    // Hard negatives: q37's exact ranking with the label inequality on
    // the JOIN (per-query predicate, not a corpus pre-filter).
    "q129_hard_negatives" ->
      s"""WITH $embCte,
         |q AS (SELECT * FROM nm WHERE vec_id < 10),
         |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |              c.label AS n_label,
         |              ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) AS score
         |       FROM nm c CROSS JOIN q
         |       WHERE c.vec_id <> q.vec_id AND c.label <> q.label),
         |rk AS (SELECT query_id, neighbor_id, n_label, score,
         |              row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
         |       FROM sc)
         |SELECT query_id, neighbor_id, n_label, score, CAST(rnk AS INT) AS rank
         |FROM rk WHERE rnk <= 5
         |ORDER BY query_id, rank""".stripMargin,
    "q130_hard_negatives_lsh" ->
      s"""WITH $embCte,
         |bk AS (SELECT vec_id, label, emb, nrm,
         |    (CASE WHEN list_dot_product(emb, ${planeLit(0)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(1)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(2)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(3)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS bucket
         |  FROM nm),
         |q AS (SELECT * FROM bk WHERE vec_id < 10),
         |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |              c.label AS n_label,
         |              ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) AS score
         |       FROM bk c JOIN q ON c.bucket = q.bucket
         |        AND c.vec_id <> q.vec_id AND c.label <> q.label),
         |rk AS (SELECT query_id, neighbor_id, n_label, score,
         |              row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
         |       FROM sc)
         |SELECT query_id, neighbor_id, n_label, score, CAST(rnk AS INT) AS rank
         |FROM rk WHERE rnk <= 3
         |ORDER BY query_id, rank""".stripMargin,
    // Okapi BM25, integer-exact: idf quantized once per query term to
    // micro-nats (the q181 contract), the tf saturation term cleared of
    // decimals (k1=1.2, b=0.75, avgdl=T/N; multiply num and den by 10T)
    // and floored to exact ppm in HUGEINT — Σ idf·tf_ppm is then pure
    // integer arithmetic, reproducible value-for-value.
    "q186_bm25_search" -> bm25FlatSql,
    // Incremental index maintenance (q286): the Spark side ranks on
    // MERGED per-half index states; the oracle is the FLAT q186
    // computation VERBATIM — the hash match is the monoid proof that
    // merge(state(A), state(B)) ≡ state(A ∪ B).
    "q286_bm25_incremental" -> bm25FlatSql,
    // Int8 scalar quantization: L2-normalize (the same sequential
    // double dot the engine's norm computes), one symmetric corpus-wide
    // scale, codes floor(127·x̂/scale) — IEEE double ops in a fixed
    // order, no transcendentals, so both engines code identically; the
    // ranking key is an exact integer dot product. The exact float
    // top-5 (the q37 shape) feeds the per-hit recall flag.
    "q187_quantized_topk" ->
      s"""WITH $embCte,
         |ux AS (SELECT vec_id, unnest(emb) AS x,
         |              unnest(range(0, len(emb))) AS i, nrm FROM nm),
         |nx AS (SELECT vec_id, i,
         |         CASE WHEN nrm = 0.0 THEN 0.0 ELSE x / nrm END AS xn
         |       FROM ux),
         |sc0 AS (SELECT max(abs(xn)) AS scale FROM nx),
         |qz AS (SELECT vec_id, i,
         |         CAST(CASE WHEN scale = 0.0 THEN 0.0
         |              ELSE floor(127.0 * xn / scale) END AS BIGINT) AS qx
         |       FROM nx CROSS JOIN sc0),
         |q AS (SELECT * FROM qz WHERE vec_id < 10),
         |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |              CAST(SUM(q.qx * c.qx) AS BIGINT) AS qdot
         |       FROM qz c JOIN q ON c.i = q.i AND c.vec_id <> q.vec_id
         |       GROUP BY q.vec_id, c.vec_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |         ORDER BY qdot DESC, neighbor_id) AS rnk FROM sc),
         |eq AS (SELECT * FROM nm WHERE vec_id < 10),
         |esc AS (SELECT eq.vec_id AS query_id, c.vec_id AS neighbor_id,
         |          CASE WHEN eq.nrm * c.nrm = 0.0 THEN 0.0
         |               ELSE ROUND(list_dot_product(eq.emb, c.emb)
         |                          /(eq.nrm*c.nrm), 4) END AS score
         |        FROM nm c CROSS JOIN eq WHERE c.vec_id <> eq.vec_id),
         |erk AS (SELECT query_id, neighbor_id,
         |          row_number() OVER (PARTITION BY query_id
         |            ORDER BY score DESC, neighbor_id) AS rnk
         |        FROM esc)
         |SELECT rk.query_id, CAST(rk.rnk AS INT) AS rank, rk.neighbor_id,
         |       rk.qdot,
         |       CASE WHEN e.neighbor_id IS NULL THEN 0 ELSE 1 END AS in_exact_topk
         |FROM rk LEFT JOIN (SELECT * FROM erk WHERE rnk <= 5) e
         |  ON rk.query_id = e.query_id AND rk.neighbor_id = e.neighbor_id
         |WHERE rk.rnk <= 5
         |ORDER BY rk.query_id, rank""".stripMargin,
    // RRF over the three dense rankers, each embedded as a subquery of
    // its own oracled SQL (annBruteSql/annLshSql/annIvfSql — the q37/
    // q38/q49 definitions verbatim). ⌊10⁶/(60+rank)⌋ summed as exact
    // integers.
    "q189_rrf_fusion" ->
      s"""WITH b AS (SELECT query_id, neighbor_id, rank FROM ($annBruteSql) z1),
         |l AS (SELECT query_id, neighbor_id, rank FROM ($annLshSql) z2),
         |i AS (SELECT query_id, neighbor_id, rank FROM ($annIvfSql) z3),
         |u AS (SELECT query_id, neighbor_id, 1000000 // (60 + rank) AS c FROM b
         |      UNION ALL
         |      SELECT query_id, neighbor_id, 1000000 // (60 + rank) FROM l
         |      UNION ALL
         |      SELECT query_id, neighbor_id, 1000000 // (60 + rank) FROM i),
         |f AS (SELECT query_id, neighbor_id,
         |             CAST(SUM(c) AS BIGINT) AS rrf_micro,
         |             CAST(COUNT(*) AS INT) AS n_lists
         |      FROM u GROUP BY query_id, neighbor_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |         ORDER BY rrf_micro DESC, neighbor_id) AS rnk FROM f)
         |SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id, rrf_micro,
         |       n_lists
         |FROM rk WHERE rnk <= 5
         |ORDER BY query_id, rank""".stripMargin,
    // Multi-probe sign-LSH: the q38 bucket chain, query side fanned to
    // its bucket plus the 4 Hamming-1 neighbors; recall flag from the
    // q37 exact top-k embedded verbatim.
    "q192_multiprobe_lsh" ->
      s"""WITH $embCte,
         |bk AS (SELECT vec_id, emb, nrm,
         |    (CASE WHEN list_dot_product(emb, ${planeLit(0)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(1)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(2)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(3)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS bucket
         |  FROM nm),
         |q AS (SELECT * FROM bk WHERE vec_id < 10),
         |pq AS (SELECT q.vec_id, q.emb, q.nrm, xor(q.bucket, m.mask) AS bucket
         |       FROM q CROSS JOIN (VALUES (0),(1),(2),(4),(8)) m(mask)),
         |sc AS (SELECT pq.vec_id AS query_id, c.vec_id AS neighbor_id,
         |              ROUND(list_dot_product(pq.emb, c.emb)/(pq.nrm*c.nrm), 4) AS score
         |       FROM bk c JOIN pq ON c.bucket = pq.bucket AND c.vec_id <> pq.vec_id),
         |rk AS (SELECT query_id, neighbor_id, score,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY score DESC, neighbor_id) AS rnk FROM sc),
         |eb AS (SELECT query_id, neighbor_id FROM ($annBruteSql) z
         |       WHERE rank <= 3)
         |SELECT rk.query_id, CAST(rk.rnk AS INT) AS rank, rk.neighbor_id,
         |       rk.score,
         |       CASE WHEN eb.neighbor_id IS NULL THEN 0 ELSE 1 END AS in_exact_topk
         |FROM rk LEFT JOIN eb
         |  ON rk.query_id = eb.query_id AND rk.neighbor_id = eb.neighbor_id
         |WHERE rk.rnk <= 3
         |ORDER BY rk.query_id, rank""".stripMargin,

    // Hybrid lexical+dense RRF: the q186 BM25 chain run query-by-example
    // (query docs' own DISTINCT terms, self-hit excluded, top-10) fused
    // with the q37 dense brute top-5 by the q189 integer micro-unit RRF.
    "q220_hybrid_rrf" -> hybridRrfSql,

    // SemDeDup: sign-LSH buckets (the q38 plane literals), within-bucket
    // 4-dp cosine pairs at 0.40, q47-style reachability components,
    // most-central survivor (max Σ pair cosines e4, ties to smallest id).
    "q221_semantic_dedup" ->
      s"""WITH RECURSIVE $embCte,
         |bk AS (SELECT vec_id, emb, nrm,
         |    (CASE WHEN list_dot_product(emb, ${planeLit(0)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(1)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(2)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(3)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS bucket
         |  FROM nm),
         |pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         ROUND(list_dot_product(a.emb, b.emb)/(a.nrm*b.nrm), 4) AS cos
         |       FROM bk a JOIN bk b
         |         ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |pairs AS (SELECT * FROM pr WHERE cos >= 0.40),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(node, label) AS (
         |  SELECT src AS node, src AS label FROM edges
         |  UNION
         |  SELECT e.dst AS node, r.label AS label
         |  FROM reach r JOIN edges e ON e.src = r.node),
         |mem AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node),
         |cent AS (SELECT node, CAST(SUM(c) AS BIGINT) AS cent_e4 FROM (
         |    SELECT id_a AS node, CAST(round(cos*10000, 0) AS BIGINT) AS c
         |    FROM pairs
         |    UNION ALL
         |    SELECT id_b, CAST(round(cos*10000, 0) AS BIGINT) FROM pairs) z
         |  GROUP BY node),
         |j AS (SELECT m.cluster_id, m.node, c.cent_e4
         |      FROM mem m JOIN cent c ON m.node = c.node),
         |r AS (SELECT cluster_id, node, cent_e4,
         |             row_number() OVER (PARTITION BY cluster_id
         |               ORDER BY cent_e4 DESC, node) AS rk
         |      FROM j)
         |SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
         |       MIN(CASE WHEN rk = 1 THEN node END) AS kept_vec,
         |       MIN(CASE WHEN rk = 1 THEN cent_e4 END) AS kept_cent_e4,
         |       CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
         |FROM r GROUP BY cluster_id
         |ORDER BY cluster_id""".stripMargin,

    // Frozen-weight reranker: the q220 fused candidates rescored by the
    // low-rank bilinear form (P·q)·(P·d), P = the 4x64 embedWeight
    // integer matrix as literal DOUBLE[] rows; 4-dp rounded ranking key.
    "q224_rerank" ->
      s"""WITH f AS (SELECT query_id, rank AS rrf_rank, neighbor_id
         |           FROM ($hybridRrfSql) zf),
         |$embCte,
         |pj AS (SELECT vec_id,
         |         list_dot_product(emb, ${wLit(0)}::DOUBLE[]) AS p0,
         |         list_dot_product(emb, ${wLit(1)}::DOUBLE[]) AS p1,
         |         list_dot_product(emb, ${wLit(2)}::DOUBLE[]) AS p2,
         |         list_dot_product(emb, ${wLit(3)}::DOUBLE[]) AS p3
         |       FROM nm),
         |s AS (SELECT f.query_id, f.rrf_rank, f.neighbor_id,
         |        ROUND(q.p0*d.p0 + q.p1*d.p1 + q.p2*d.p2 + q.p3*d.p3, 4)
         |          AS rerank_score
         |      FROM f JOIN pj q ON q.vec_id = f.query_id
         |             LEFT JOIN pj d ON d.vec_id = f.neighbor_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY rerank_score DESC NULLS LAST, neighbor_id) AS rr
         |      FROM s)
         |SELECT query_id, CAST(rr AS INT) AS rerank_rank, neighbor_id,
         |       rerank_score, CAST(rrf_rank AS INT) AS rrf_rank
         |FROM r ORDER BY query_id, rerank_rank""".stripMargin,

    // Silhouette: unit vectors quantized once to integer e6 components,
    // label sum vectors, linear mean-similarity identity, sign-split
    // floor divisions throughout (round toward zero on both engines).
    "q226_silhouette" ->
      s"""WITH $embCte,
         |ux AS (SELECT vec_id, label, unnest(emb) AS x,
         |              unnest(range(0, len(emb))) AS i, nrm
         |       FROM nm WHERE nrm > 0),
         |u6 AS (SELECT vec_id, label, i,
         |         CAST(round(x / nrm * 1000000, 0) AS BIGINT) AS xe6 FROM ux),
         |sums AS (SELECT label AS l2, i, CAST(SUM(xe6) AS BIGINT) AS s
         |         FROM u6 GROUP BY 1, 2),
         |nl AS (SELECT label AS l2, COUNT(*) AS n_l
         |       FROM nm WHERE nrm > 0 GROUP BY 1),
         |sdot AS (SELECT vec_id, CAST(SUM(xe6*xe6) AS BIGINT) AS sd
         |         FROM u6 GROUP BY 1),
         |dots AS (SELECT u6.vec_id, u6.label, sums.l2,
         |           CAST(SUM(u6.xe6 * sums.s) AS BIGINT) AS dot
         |         FROM u6 JOIN sums ON u6.i = sums.i GROUP BY 1, 2, 3),
         |m AS (SELECT d.vec_id, d.label, d.l2,
         |        CASE WHEN d.label = d.l2 THEN d.dot - sdot.sd
         |             ELSE d.dot END AS num,
         |        CASE WHEN d.label = d.l2 THEN greatest(nl.n_l - 1, 1)
         |             ELSE nl.n_l END AS den
         |      FROM dots d JOIN sdot ON d.vec_id = sdot.vec_id
         |                  JOIN nl ON d.l2 = nl.l2),
         |me AS (SELECT vec_id, label, l2,
         |         CASE WHEN num >= 0 THEN num // den
         |              ELSE -((-num) // den) END AS mean_e12 FROM m),
         |ab AS (SELECT vec_id, label,
         |         MAX(CASE WHEN label = l2 THEN mean_e12 END) AS a_e12,
         |         MAX(CASE WHEN label <> l2 THEN mean_e12 END) AS b_e12
         |       FROM me GROUP BY 1, 2),
         |sil AS (SELECT vec_id, label, a_e12, b_e12,
         |          greatest(1000000000000 - a_e12, 1000000000000 - b_e12, 1)
         |            AS d
         |        FROM ab),
         |sp AS (SELECT vec_id, label,
         |         CASE WHEN a_e12 >= b_e12
         |              THEN CAST((a_e12 - b_e12) * 1000000 // d AS BIGINT)
         |              ELSE -CAST((b_e12 - a_e12) * 1000000 // d AS BIGINT)
         |         END AS s_ppm
         |       FROM sil),
         |g AS (SELECT label, COUNT(*) AS n_vecs,
         |             CAST(SUM(s_ppm) AS BIGINT) AS ssum,
         |             CAST(SUM(CASE WHEN s_ppm > 0 THEN 1 ELSE 0 END)
         |               AS BIGINT) AS n_well_placed
         |      FROM sp GROUP BY label)
         |SELECT label, CAST(n_vecs AS BIGINT) AS n_vecs,
         |       CASE WHEN ssum >= 0 THEN ssum // n_vecs
         |            ELSE -((-ssum) // n_vecs) END AS mean_sil_ppm,
         |       n_well_placed
         |FROM g ORDER BY label""".stripMargin,

    // Product quantization: unit vectors in e6 integers, 32 subspaces
    // of 2 dims, 64-entry codebooks seeded from vec_id 0..63 and
    // refined by ONE Lloyd step (sign-split floor-mean recenter), codes
    // by exact integer argmin distance (ties to smallest id), ADC
    // scores = sums of LUT integer dots; exact float top-5 feeds the
    // recall flag (measured 0.78 at sf0.01).
    "q227_pq_topk" -> pqTopKSql,

    // MMR diversified top-k: five unrolled greedy rounds (generated).
    "q228_mmr_topk" -> mmrSql,

    // Embedding-space source similarity: per-source unit-vector sums in
    // exact e6 integers, pairwise centroid cosine from exact integer
    // dots/norms, one double division rounded to 4 dp.
    "q230_source_emb_sim" ->
      s"""WITH $embCte,
         |sj AS (SELECT d.source AS g, nm.vec_id, nm.emb, nm.nrm
         |       FROM nm JOIN documents d ON nm.vec_id = d.doc_id
         |       WHERE nm.nrm > 0),
         |ux AS (SELECT g, vec_id, unnest(emb) AS x,
         |              unnest(range(0, len(emb))) AS i, nrm FROM sj),
         |u6 AS (SELECT g, i,
         |         CAST(round(x / nrm * 1000000, 0) AS BIGINT) AS xe6
         |       FROM ux),
         |sums AS (SELECT g, i, CAST(SUM(xe6) AS BIGINT) AS s
         |         FROM u6 GROUP BY 1, 2),
         |nc AS (SELECT g, COUNT(*) AS n FROM sj GROUP BY 1),
         |norms AS (SELECT g, SUM(CAST(s AS HUGEINT) * s) AS d2
         |          FROM sums GROUP BY 1),
         |p AS (SELECT a.g AS ga, b.g AS gb,
         |        SUM(CAST(a.s AS HUGEINT) * b.s) AS dot
         |      FROM sums a JOIN sums b ON a.i = b.i AND a.g < b.g
         |      GROUP BY 1, 2)
         |SELECT p.ga AS source_a, p.gb AS source_b,
         |       CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
         |       ROUND(CAST(p.dot AS DOUBLE) /
         |         (sqrt(CAST(da.d2 AS DOUBLE)) * sqrt(CAST(db.d2 AS DOUBLE))),
         |         4) AS cos_centroid
         |FROM p JOIN norms da ON p.ga = da.g JOIN norms db ON p.gb = db.g
         |       JOIN nc na ON p.ga = na.g JOIN nc nb ON p.gb = nb.g
         |ORDER BY source_a, source_b""".stripMargin,

    // IVFADC: the q49 IVF centroid probe restricting the q227 PQ ADC
    // scoring to each query's 2 nearest cells; full-corpus exact top-5
    // recall flag.
    "q233_ivf_pq_topk" -> ivfAdcSql,
    "q292_ivfadc_residual" -> ivfAdcResidualSql,

    // Incremental semantic dedup: even-id persisted state, odd-id
    // batch; q221's buckets + 4-dp verified cosine, batch-side probes
    // only, keep-first within the batch.
    "q234_semantic_dedup_incr" ->
      s"""WITH $embCte,
         |bk AS (SELECT vec_id, emb, nrm,
         |    (CASE WHEN list_dot_product(emb, ${planeLit(0)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(1)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(2)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(3)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS bucket
         |  FROM nm),
         |sts AS (SELECT * FROM bk WHERE vec_id % 2 = 0),
         |bat AS (SELECT * FROM bk WHERE vec_id % 2 = 1),
         |sb AS (SELECT * FROM (
         |    SELECT b.vec_id AS vid, s.vec_id AS other,
         |           ROUND(list_dot_product(b.emb, s.emb)/(b.nrm*s.nrm), 4) AS cos,
         |           1 AS from_state
         |    FROM bat b JOIN sts s ON b.bucket = s.bucket) z
         |  WHERE cos >= 0.40),
         |bb AS (SELECT * FROM (
         |    SELECT b.vec_id AS vid, o.vec_id AS other,
         |           ROUND(list_dot_product(b.emb, o.emb)/(b.nrm*o.nrm), 4) AS cos,
         |           0 AS from_state
         |    FROM bat b JOIN bat o ON b.bucket = o.bucket
         |                         AND o.vec_id < b.vec_id) z
         |  WHERE cos >= 0.40),
         |m AS (SELECT vid, other, CAST(round(cos*10000, 0) AS BIGINT) AS cos_e4,
         |             from_state
         |      FROM sb
         |      UNION ALL
         |      SELECT vid, other, CAST(round(cos*10000, 0) AS BIGINT), from_state
         |      FROM bb),
         |ag AS (SELECT vid, CAST(SUM(from_state) AS BIGINT) AS n_dup_state,
         |              CAST(SUM(1 - from_state) AS BIGINT) AS n_dup_batch
         |       FROM m GROUP BY vid),
         |best AS (SELECT vid, other AS best_match, cos_e4 AS best_cos_e4 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vid
         |      ORDER BY cos_e4 DESC, other) AS rn FROM m) z
         |  WHERE rn = 1)
         |SELECT b.vec_id,
         |       COALESCE(ag.n_dup_state, 0) AS n_dup_state,
         |       COALESCE(ag.n_dup_batch, 0) AS n_dup_batch,
         |       best.best_match, best.best_cos_e4,
         |       CAST(CASE WHEN best.vid IS NULL THEN 0 ELSE 1 END AS INT)
         |         AS dropped
         |FROM bat b LEFT JOIN ag ON ag.vid = b.vec_id
         |     LEFT JOIN best ON best.vid = b.vec_id
         |ORDER BY vec_id""".stripMargin,

    // Multi-round k-means: 4 unrolled Lloyd rounds with convergence
    // certificate (generated — see kmeansRoundsSql).
    "q236_kmeans_rounds" -> kmeansRoundsSql,

    // Label spreading: 3 unrolled frontier rounds over the bucketed
    // cosine graph (generated — see labelSpreadingSql).
    "q239_label_spreading" -> labelSpreadingSql,

    // Power iteration: e4-quantized embedding matrix, three unrolled
    // v <- normalize(A^T A v) rounds (all-ones e4 start), max-component
    // renormalization with sign-split floor division, cos^2 alignment
    // certificate between the last two rounds in exact ppm.
    "q245_power_iteration" ->
      """WITH qv AS (SELECT vec_id, CAST(g - 1 AS INT) AS i,
        |         CAST(ROUND(CAST(embedding[g] AS DOUBLE)*10000, 0) AS BIGINT) AS q
        |       FROM (SELECT vec_id, embedding,
        |               unnest(range(1, len(embedding)+1)) AS g
        |             FROM embeddings) z),
        |v0 AS (SELECT DISTINCT i, CAST(10000 AS BIGINT) AS v FROM qv),
        |s1 AS (SELECT vec_id, CAST(SUM(q * v) AS BIGINT) AS s
        |       FROM qv JOIN v0 USING (i) GROUP BY vec_id),
        |w1 AS (SELECT i, SUM(CAST(q AS HUGEINT) * s) AS w
        |       FROM qv JOIN s1 USING (vec_id) GROUP BY i),
        |m1 AS (SELECT MAX(abs(w)) AS m FROM w1),
        |v1 AS (SELECT i, CAST(CASE WHEN w >= 0 THEN (abs(w)*10000)//m
        |              ELSE -((abs(w)*10000)//m) END AS BIGINT) AS v
        |       FROM w1 CROSS JOIN m1),
        |s2 AS (SELECT vec_id, CAST(SUM(q * v) AS BIGINT) AS s
        |       FROM qv JOIN v1 USING (i) GROUP BY vec_id),
        |w2 AS (SELECT i, SUM(CAST(q AS HUGEINT) * s) AS w
        |       FROM qv JOIN s2 USING (vec_id) GROUP BY i),
        |m2 AS (SELECT MAX(abs(w)) AS m FROM w2),
        |v2 AS (SELECT i, CAST(CASE WHEN w >= 0 THEN (abs(w)*10000)//m
        |              ELSE -((abs(w)*10000)//m) END AS BIGINT) AS v
        |       FROM w2 CROSS JOIN m2),
        |s3 AS (SELECT vec_id, CAST(SUM(q * v) AS BIGINT) AS s
        |       FROM qv JOIN v2 USING (i) GROUP BY vec_id),
        |w3 AS (SELECT i, SUM(CAST(q AS HUGEINT) * s) AS w
        |       FROM qv JOIN s3 USING (vec_id) GROUP BY i),
        |m3 AS (SELECT MAX(abs(w)) AS m FROM w3),
        |v3 AS (SELECT i, CAST(CASE WHEN w >= 0 THEN (abs(w)*10000)//m
        |              ELSE -((abs(w)*10000)//m) END AS BIGINT) AS v
        |       FROM w3 CROSS JOIN m3),
        |ct AS (SELECT SUM(CAST(a.v AS HUGEINT) * b.v) AS dt,
        |              SUM(CAST(b.v AS HUGEINT) * b.v) AS nv,
        |              SUM(CAST(a.v AS HUGEINT) * a.v) AS np
        |       FROM v2 a JOIN v3 b USING (i))
        |SELECT CAST(v3.i AS INT) AS dim,
        |       CAST(v2.v AS BIGINT) AS v_prev_e4,
        |       CAST(v3.v AS BIGINT) AS v_e4,
        |       CAST((dt*dt*1000000)//(nv*np) AS BIGINT) AS align_ppm
        |FROM v3 JOIN v2 USING (i) CROSS JOIN ct
        |ORDER BY dim""".stripMargin,

    // Unified retrieval eval: every ANN tier's top-3 vs the brute-force
    // true NN; MRR@3 + hit@3 in exact floor integers. Nests the four
    // tiers' own oracled SQL verbatim.
    "q246_retrieval_eval" ->
      s"""WITH b AS (SELECT query_id, neighbor_id, rank FROM ($annBruteSql) z1),
         |t AS (SELECT query_id, neighbor_id AS true_nn FROM b WHERE rank = 1),
         |u AS (SELECT 'brute' AS system, query_id, neighbor_id, rank
         |        FROM b WHERE rank <= 3
         |      UNION ALL
         |      SELECT 'lsh', query_id, neighbor_id, rank
         |        FROM ($annLshSql) z2 WHERE rank <= 3
         |      UNION ALL
         |      SELECT 'ivf', query_id, neighbor_id, rank
         |        FROM ($annIvfSql) z3 WHERE rank <= 3
         |      UNION ALL
         |      SELECT 'pq', query_id, neighbor_id, rank
         |        FROM ($pqTopKSql) z4 WHERE rank <= 3
         |      UNION ALL
         |      SELECT 'ivfadc', query_id, neighbor_id, rank
         |        FROM ($ivfAdcSql) z5 WHERE rank <= 3),
         |nq AS (SELECT COUNT(*) AS n_queries FROM t),
         |f AS (SELECT u.system, u.rank FROM u
         |      JOIN t ON u.query_id = t.query_id AND u.neighbor_id = t.true_nn),
         |g AS (SELECT system, COUNT(*) AS n_found,
         |        CAST(SUM(1000000 // rank) AS BIGINT) AS sum_rr,
         |        CAST(SUM(CAST(1000000 // rank AS BIGINT)
         |                 * (1000000 // rank)) AS BIGINT) AS sum_rr2
         |      FROM f GROUP BY system),
         |sp AS (SELECT unnest(['brute','lsh','ivf','pq','ivfadc']) AS system),
         |w AS (SELECT sp.system, nq.n_queries,
         |        COALESCE(g.n_found, 0) AS nf,
         |        COALESCE(g.sum_rr, 0) AS sr, COALESCE(g.sum_rr2, 0) AS sr2
         |      FROM sp LEFT JOIN g USING (system) CROSS JOIN nq)
         |SELECT system, CAST(n_queries AS BIGINT) AS n_queries,
         |       CAST(nf AS BIGINT) AS n_found,
         |       CAST(nf * 1000000 // n_queries AS BIGINT) AS hit_at3_ppm,
         |       CAST(sr // n_queries AS BIGINT) AS mrr_e6,
         |       CAST(CASE WHEN n_queries > 1 THEN ROUND(SQRT(
         |              CAST(CAST(n_queries AS HUGEINT) * nf
         |                   - CAST(nf AS HUGEINT) * nf AS DOUBLE) /
         |              CAST(CAST(n_queries AS HUGEINT) * n_queries
         |                   * (n_queries - 1) AS DOUBLE)) * 1000000, 0)
         |            ELSE 0 END AS BIGINT) AS hit_se_ppm,
         |       CAST(CASE WHEN n_queries > 1 THEN ROUND(SQRT(
         |              CAST(CAST(n_queries AS HUGEINT) * sr2
         |                   - CAST(sr AS HUGEINT) * sr AS DOUBLE) /
         |              CAST(CAST(n_queries AS HUGEINT) * n_queries
         |                   * (n_queries - 1) AS DOUBLE)), 0)
         |            ELSE 0 END AS BIGINT) AS mrr_se_e6
         |FROM w
         |ORDER BY system""".stripMargin,

    // Cluster eval: the q236 unrolled assignment vs the label column —
    // per-cluster purity + global NMI (2·MI/(Hc+Hl), round-e6 ln terms,
    // the shared N·1e6 denominator cancels; clamped >= 0).
    "q247_cluster_eval" ->
      s"""WITH ${kmeansAssignCtes(4)},
         |lb AS (SELECT DISTINCT vec_id, label FROM ku6),
         |ctg AS (SELECT a.cell, lb.label, COUNT(*) AS n
         |        FROM a4 a JOIN lb USING (vec_id) GROUP BY 1, 2),
         |rt AS (SELECT cell, CAST(SUM(n) AS BIGINT) AS ncl FROM ctg GROUP BY cell),
         |cl AS (SELECT label, CAST(SUM(n) AS BIGINT) AS nlb FROM ctg GROUP BY label),
         |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM ctg),
         |mi AS (SELECT CAST(SUM(n * CAST(round(ln(
         |           (CAST(n AS DOUBLE) * nn) / (CAST(ncl AS DOUBLE) * nlb))
         |           * 1e6, 0) AS BIGINT)) AS HUGEINT) AS mi_num
         |       FROM ctg JOIN rt USING (cell) JOIN cl USING (label)
         |            CROSS JOIN tt),
         |hcn AS (SELECT -CAST(SUM(ncl * CAST(round(ln(
         |            CAST(ncl AS DOUBLE) / nn) * 1e6, 0) AS BIGINT))
         |          AS HUGEINT) AS hc_num
         |        FROM rt CROSS JOIN tt),
         |hln AS (SELECT -CAST(SUM(nlb * CAST(round(ln(
         |            CAST(nlb AS DOUBLE) / nn) * 1e6, 0) AS BIGINT))
         |          AS HUGEINT) AS hl_num
         |        FROM cl CROSS JOIN tt),
         |nm2 AS (SELECT CAST(CASE WHEN hc_num + hl_num = 0 THEN 0
         |          ELSE greatest(0, 2 * mi_num * 1000000
         |               // (hc_num + hl_num)) END AS BIGINT) AS nmi_ppm
         |        FROM mi CROSS JOIN hcn CROSS JOIN hln),
         |pu AS (SELECT cell, label, n,
         |         row_number() OVER (PARTITION BY cell
         |           ORDER BY n DESC, label) AS rk,
         |         SUM(n) OVER (PARTITION BY cell) AS n_members
         |       FROM ctg),
         |pr AS (SELECT cell, label AS majority_label, n AS n_majority,
         |         n_members
         |       FROM pu WHERE rk = 1)
         |SELECT CAST(cell AS INT) AS cluster,
         |       CAST(n_members AS BIGINT) AS n_members,
         |       CAST(majority_label AS INT) AS majority_label,
         |       CAST(n_majority AS BIGINT) AS n_majority,
         |       CAST(n_majority * 1000000 // n_members AS BIGINT) AS purity_ppm,
         |       nm2.nmi_ppm
         |FROM pr CROSS JOIN nm2
         |ORDER BY cluster""".stripMargin,

    // Embedding cross-source near-dup matrix: the q221 bucketed pair
    // tier attributed to sources (vec_id = doc_id), per unordered pair
    // the count, max cosine (e4) and lexicographically-first example.
    "q252_emb_cross_source" ->
      s"""WITH $embCte,
         |bk AS (SELECT vec_id, emb, nrm,
         |    (CASE WHEN list_dot_product(emb, ${planeLit(0)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(1)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(2)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
         |  + (CASE WHEN list_dot_product(emb, ${planeLit(3)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS bucket
         |  FROM nm),
         |pr2 AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |          ROUND(list_dot_product(a.emb, b.emb)/(a.nrm*b.nrm), 4) AS cos
         |        FROM bk a JOIN bk b
         |          ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |pairs AS (SELECT id_a, id_b,
         |            CAST(round(cos * 10000, 0) AS BIGINT) AS cos_e4
         |          FROM pr2 WHERE cos >= 0.40),
         |at AS (SELECT least(sa.source, sb.source) AS source_lo,
         |         greatest(sa.source, sb.source) AS source_hi,
         |         p.id_a, p.id_b, p.cos_e4
         |       FROM pairs p
         |       JOIN documents sa ON sa.doc_id = p.id_a
         |       JOIN documents sb ON sb.doc_id = p.id_b),
         |rk AS (SELECT *, row_number() OVER (
         |         PARTITION BY source_lo, source_hi
         |         ORDER BY id_a, id_b) AS rn FROM at),
         |ag AS (SELECT source_lo, source_hi, COUNT(*) AS n_pairs,
         |         CAST(MAX(cos_e4) AS BIGINT) AS max_cos_e4
         |       FROM at GROUP BY 1, 2)
         |SELECT ag.source_lo, ag.source_hi,
         |       CAST(ag.n_pairs AS BIGINT) AS n_pairs, ag.max_cos_e4,
         |       rk.id_a AS example_a, rk.id_b AS example_b
         |FROM ag JOIN rk ON rk.source_lo = ag.source_lo
         |     AND rk.source_hi = ag.source_hi AND rk.rn = 1
         |ORDER BY ag.source_lo, ag.source_hi""".stripMargin,

    // PRF search: stage-1 BM25 (query-by-example, self excluded) ->
    // top-5 feedback docs -> 3 expansion terms (tf*idf over feedback,
    // anti original terms) -> rescore with the expanded set.
    "q254_prf_search" ->
      s"""WITH $nCte, $tokCte,
         |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
         |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
         |dft AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
         |tot AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM dl),
         |qx AS (SELECT DISTINCT doc_id AS query_id, w FROM tok WHERE doc_id < 10),
         |qi AS (SELECT qx.query_id, qx.w,
         |         CAST(round(ln(1 + (n - df + 0.5) / (df + 0.5)) * 1e6, 0)
         |              AS BIGINT) AS idf_micro
         |       FROM qx JOIN dft USING (w) CROSS JOIN tot),
         |sc AS (SELECT qi.query_id, tf.doc_id,
         |         CAST(SUM(qi.idf_micro *
         |           CAST(CAST(22 AS HUGEINT) * tf.tf * t * 1000000 //
         |                (CAST(10 AS HUGEINT) * t * tf.tf + 3 * t + 9 * dl.dl * n)
         |                AS BIGINT)) AS BIGINT) AS score_e12
         |       FROM qi JOIN tf USING (w) JOIN dl USING (doc_id)
         |            CROSS JOIN tot
         |       WHERE tf.doc_id <> qi.query_id
         |       GROUP BY qi.query_id, tf.doc_id),
         |fb AS (SELECT query_id, doc_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY score_e12 DESC, doc_id) AS rnk FROM sc) z
         |  WHERE rnk <= 5),
         |ia AS (SELECT w,
         |         CAST(round(ln(1 + (n - df + 0.5) / (df + 0.5)) * 1e6, 0)
         |              AS BIGINT) AS idf_micro
         |       FROM dft CROSS JOIN tot),
         |ex0 AS (SELECT fb.query_id, tf.w,
         |          CAST(SUM(tf.tf * ia.idf_micro) AS BIGINT) AS escore
         |        FROM fb JOIN tf USING (doc_id) JOIN ia USING (w)
         |        GROUP BY 1, 2),
         |ex1 AS (SELECT e.query_id, e.w, e.escore
         |        FROM ex0 e LEFT JOIN qx
         |          ON qx.query_id = e.query_id AND qx.w = e.w
         |        WHERE qx.w IS NULL),
         |ex2 AS (SELECT query_id, w FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY escore DESC, w) AS erk FROM ex1) z
         |  WHERE erk <= 3),
         |qe AS (SELECT query_id, w FROM qx
         |       UNION SELECT query_id, w FROM ex2),
         |qi2 AS (SELECT qe.query_id, qe.w,
         |          CAST(round(ln(1 + (n - df + 0.5) / (df + 0.5)) * 1e6, 0)
         |               AS BIGINT) AS idf_micro
         |        FROM qe JOIN dft USING (w) CROSS JOIN tot),
         |sc2 AS (SELECT qi2.query_id, tf.doc_id,
         |          CAST(SUM(qi2.idf_micro *
         |            CAST(CAST(22 AS HUGEINT) * tf.tf * t * 1000000 //
         |                 (CAST(10 AS HUGEINT) * t * tf.tf + 3 * t + 9 * dl.dl * n)
         |                 AS BIGINT)) AS BIGINT) AS score_e12,
         |          CAST(COUNT(*) AS INT) AS n_hit_terms,
         |          CAST(SUM(CASE WHEN ex2.w IS NOT NULL THEN 1 ELSE 0 END)
         |            AS INT) AS n_exp_terms
         |        FROM qi2 JOIN tf USING (w) JOIN dl USING (doc_id)
         |             CROSS JOIN tot
         |             LEFT JOIN ex2 ON ex2.query_id = qi2.query_id
         |               AND ex2.w = qi2.w
         |        WHERE tf.doc_id <> qi2.query_id
         |        GROUP BY qi2.query_id, tf.doc_id)
         |SELECT query_id, CAST(rnk AS INT) AS rank, doc_id, score_e12,
         |       n_hit_terms, n_exp_terms
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY score_e12 DESC, doc_id) AS rnk FROM sc2) z
         |WHERE rnk <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // Chunk retrieval with doc max-pooling: q75 chunks as BM25 units,
    // best-chunk pooling, per-query doc ranking.
    "q259_chunk_retrieval" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |m AS (SELECT doc_id, toks,
         |        GREATEST((CAST(len(toks) AS BIGINT) - 16 + 47) // 48, 1) AS n_chunks
         |      FROM tk),
         |g AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_idx FROM m),
         |ck AS (SELECT doc_id*1000000 + chunk_idx AS cid,
         |         list_slice(toks, chunk_idx*48 + 1, chunk_idx*48 + 64) AS ctoks
         |       FROM g),
         |ctok AS (SELECT cid, unnest(ctoks) AS w FROM ck),
         |tf AS (SELECT cid, w, COUNT(*) AS tf FROM ctok GROUP BY 1, 2),
         |dl AS (SELECT cid, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY cid),
         |dft AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
         |tot AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM dl),
         |qv(query_id, w) AS (VALUES
         |  (1, 'spark'), (1, 'hash'), (1, 'join'),
         |  (2, 'window'), (2, 'merge'), (2, 'sort'),
         |  (3, 'stream'), (3, 'batch'), (3, 'data')),
         |qi AS (SELECT qv.query_id, qv.w,
         |         CAST(round(ln(1 + (n - df + 0.5) / (df + 0.5)) * 1e6, 0)
         |              AS BIGINT) AS idf_micro
         |       FROM qv JOIN dft USING (w) CROSS JOIN tot),
         |sc AS (SELECT qi.query_id, tf.cid,
         |         CAST(SUM(qi.idf_micro *
         |           CAST(CAST(22 AS HUGEINT) * tf.tf * t * 1000000 //
         |                (CAST(10 AS HUGEINT) * t * tf.tf + 3 * t + 9 * dl.dl * n)
         |                AS BIGINT)) AS BIGINT) AS score_e12
         |       FROM qi JOIN tf USING (w) JOIN dl USING (cid)
         |            CROSS JOIN tot
         |       GROUP BY qi.query_id, tf.cid),
         |pl AS (SELECT query_id, cid // 1000000 AS doc_id,
         |         cid % 1000000 AS chunk_idx, score_e12 FROM sc),
         |ag AS (SELECT query_id, doc_id,
         |         CAST(MAX(score_e12) AS BIGINT) AS best_score_e12,
         |         CAST(COUNT(*) AS BIGINT) AS n_chunks_hit
         |       FROM pl GROUP BY 1, 2),
         |bc AS (SELECT query_id, doc_id,
         |         CAST(chunk_idx AS BIGINT) AS best_chunk
         |       FROM (SELECT *, row_number() OVER (
         |           PARTITION BY query_id, doc_id
         |           ORDER BY score_e12 DESC, chunk_idx) AS rn FROM pl) z
         |       WHERE rn = 1),
         |rk AS (SELECT ag.query_id, ag.doc_id, bc.best_chunk,
         |         ag.best_score_e12, ag.n_chunks_hit,
         |         row_number() OVER (PARTITION BY ag.query_id
         |           ORDER BY ag.best_score_e12 DESC, ag.doc_id) AS rnk
         |       FROM ag JOIN bc USING (query_id, doc_id))
         |SELECT query_id, CAST(rnk AS INT) AS rank, doc_id, best_chunk,
         |       best_score_e12, n_chunks_hit
         |FROM rk WHERE rnk <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // IVF probe sweep (generated — see ivfSweepSql).
    "q262_ivf_probe_sweep" -> ivfSweepSql,

    // k-NN graph: best-5 seeded from TWO independent sign-LSH tables
    // (a single table's seed graph is bucket-disconnected, so descent
    // could never cross buckets), one NN-descent round over the
    // undirected seed graph, recall of each stage vs the exact 5-NN of
    // the vec_id < 64 probe nodes.
    "q267_knn_descent" ->
      s"""WITH $embCte,
         |$knnDescentCtes,
         |pb AS (SELECT vec_id AS pid, emb, nrm FROM nm WHERE vec_id < 64),
         |ex AS (SELECT pb.pid AS id, c.vec_id AS nid,
         |         ROUND(list_dot_product(pb.emb, c.emb)/(pb.nrm*c.nrm), 4)
         |           AS score
         |       FROM nm c CROSS JOIN pb WHERE c.vec_id <> pb.pid),
         |ek AS (SELECT id, nid FROM (SELECT *, row_number() OVER (
         |           PARTITION BY id ORDER BY score DESC, nid) AS rk FROM ex) z
         |       WHERE rk <= 5),
         |st AS (SELECT 'seed' AS stage,
         |         (SELECT COUNT(DISTINCT id) FROM sd) AS n_nodes,
         |         (SELECT COUNT(*) FROM sd) AS n_edges,
         |         (SELECT COUNT(*) FROM ek) AS n_exact,
         |         (SELECT COUNT(*) FROM ek JOIN sd USING (id, nid)) AS n_hit
         |       UNION ALL
         |       SELECT 'descent',
         |         (SELECT COUNT(DISTINCT id) FROM ds),
         |         (SELECT COUNT(*) FROM ds),
         |         (SELECT COUNT(*) FROM ek),
         |         (SELECT COUNT(*) FROM ek JOIN ds USING (id, nid)))
         |SELECT stage, CAST(n_nodes AS BIGINT) AS n_nodes,
         |       CAST(n_edges AS BIGINT) AS n_edges,
         |       CAST(n_exact AS BIGINT) AS n_exact,
         |       CAST(n_hit AS BIGINT) AS n_hit,
         |       CAST(CASE WHEN n_exact = 0 THEN 0
         |            ELSE n_hit * 1000000 // n_exact END AS BIGINT)
         |         AS recall_ppm
         |FROM st
         |ORDER BY stage""".stripMargin,

    // NN-descent trajectory: the q267 seed graph unrolled through 3
    // descent rounds (knnRoundCtes), per-round recall + EXCEPT-based
    // new-edge count; converged = round added no new edge.
    "q280_knn_rounds" -> knnTrajectorySql(3),

    // Graph-ANN beam-search serving over the q280 3-round descent graph
    // (generated — see graphAnnSql): 4 fixed entries, 3 beam-4 hops,
    // top-5 answers with exact-tier hit flags + visited-set size.
    "q304_graph_ann_serve" -> graphAnnSql(
      graphRounds = 3, hops = 3, k = 5, beam = 4, nEntry = 4),

    // Beam-width sweep of the serving walk (generated — see
    // graphAnnSweepSql): beams 1/2/8 over one shared substrate, per
    // width the visited volume + exact-tier recall ppm.
    "q310_beam_sweep" -> graphAnnSweepSql(
      graphRounds = 3, hops = 3, k = 5, beams = Seq(1, 2, 8), nEntry = 4),

    // nDCG@3 with graded relevance (gain = 4 − brute rank) across the
    // brute/lsh/ivf tiers; discounts are the Scala ndcgDiscountE6
    // constants inlined, per-query nDCG and the per-system mean are
    // exact floor divisions.
    "q281_ndcg" ->
      s"""WITH rel AS (SELECT query_id, neighbor_id AS doc_id,
         |         CAST(4 - rank AS BIGINT) AS gain
         |       FROM ($annBruteSql) zb WHERE rank <= 3),
         |u AS (SELECT 'brute' AS system, query_id, neighbor_id AS doc_id,
         |        rank FROM ($annBruteSql) z1 WHERE rank <= 3
         |      UNION ALL
         |      SELECT 'lsh', query_id, neighbor_id, rank
         |        FROM ($annLshSql) z2 WHERE rank <= 3
         |      UNION ALL
         |      SELECT 'ivf', query_id, neighbor_id, rank
         |        FROM ($annIvfSql) z3 WHERE rank <= 3),
         |disc(rnk, d) AS (VALUES $ndcgDiscValues),
         |irk AS (SELECT query_id, gain, row_number() OVER (
         |          PARTITION BY query_id ORDER BY gain DESC, doc_id) AS rnk
         |        FROM rel),
         |idcg AS (SELECT query_id, CAST(SUM(gain * d) AS BIGINT) AS idcg
         |         FROM irk JOIN disc USING (rnk) WHERE rnk <= 3
         |         GROUP BY query_id),
         |dcg AS (SELECT u.system, u.query_id,
         |          CAST(SUM(rel.gain * disc.d) AS BIGINT) AS dcg
         |        FROM u JOIN rel ON rel.query_id = u.query_id
         |          AND rel.doc_id = u.doc_id
         |        JOIN disc ON disc.rnk = u.rank
         |        GROUP BY 1, 2),
         |sy(system) AS (VALUES ('brute'), ('lsh'), ('ivf')),
         |sp AS (SELECT sy.system, idcg.query_id, idcg.idcg
         |       FROM sy CROSS JOIN idcg),
         |pq2 AS (SELECT sp.system, sp.query_id,
         |          COALESCE(dcg.dcg, 0) AS dcg, sp.idcg,
         |          CASE WHEN sp.idcg = 0 THEN 0
         |               ELSE COALESCE(dcg.dcg, 0) * 1000000 // sp.idcg END
         |            AS ndcg_ppm
         |        FROM sp LEFT JOIN dcg
         |          ON dcg.system = sp.system AND dcg.query_id = sp.query_id)
         |SELECT system, CAST(COUNT(*) AS BIGINT) AS n_queries,
         |       CAST(SUM(dcg) AS BIGINT) AS sum_dcg_e6,
         |       CAST(SUM(ndcg_ppm) // COUNT(*) AS BIGINT) AS mean_ndcg_ppm
         |FROM pq2
         |GROUP BY system
         |ORDER BY system""".stripMargin,

    // Second principal component by deflation: the q245 loop to va3,
    // exact Gram–Schmidt residual (sign-split floor), the same loop
    // again to vb3; alignment + orthogonality certificates in ppm.
    "q282_second_pc" ->
      s"""WITH qv AS MATERIALIZED (
         |       SELECT vec_id, CAST(g - 1 AS INT) AS i,
         |         CAST(ROUND(CAST(embedding[g] AS DOUBLE)*10000, 0) AS BIGINT) AS q
         |       FROM (SELECT vec_id, embedding,
         |               unnest(range(1, len(embedding)+1)) AS g
         |             FROM embeddings) z),
         |${powerRoundsCtes("qv", "a", 3)},
         |nva AS (SELECT SUM(CAST(v AS HUGEINT) * v) AS nv FROM va3),
         |pj AS (SELECT vec_id, CAST(SUM(q * v) AS BIGINT) AS s
         |       FROM qv JOIN va3 USING (i) GROUP BY vec_id),
         |q2 AS MATERIALIZED (
         |       SELECT qv.vec_id, qv.i,
         |         qv.q - CAST(CASE WHEN pj.s * va3.v >= 0
         |              THEN (CAST(pj.s AS HUGEINT) * va3.v) // nv
         |              ELSE -((-(CAST(pj.s AS HUGEINT) * va3.v)) // nv)
         |              END AS BIGINT) AS q
         |       FROM qv JOIN pj USING (vec_id) JOIN va3 USING (i)
         |            CROSS JOIN nva),
         |${powerRoundsCtes("q2", "b", 3)},
         |ct2 AS (SELECT SUM(CAST(a.v AS HUGEINT) * b.v) AS dt,
         |               SUM(CAST(b.v AS HUGEINT) * b.v) AS nv,
         |               SUM(CAST(a.v AS HUGEINT) * a.v) AS np
         |        FROM vb2 a JOIN vb3 b USING (i)),
         |ort AS (SELECT SUM(CAST(a.v AS HUGEINT) * b.v) AS dt,
         |               SUM(CAST(a.v AS HUGEINT) * a.v) AS n1,
         |               SUM(CAST(b.v AS HUGEINT) * b.v) AS n2
         |        FROM va3 a JOIN vb3 b USING (i))
         |SELECT CAST(va3.i AS INT) AS dim,
         |       CAST(va3.v AS BIGINT) AS v1_e4,
         |       CAST(vb3.v AS BIGINT) AS v2_e4,
         |       CAST((ct2.dt*ct2.dt*1000000)//(ct2.nv*ct2.np) AS BIGINT)
         |         AS align2_ppm,
         |       CAST((ort.dt*ort.dt*1000000)//(ort.n1*ort.n2) AS BIGINT)
         |         AS ortho_ppm
         |FROM va3 JOIN vb3 USING (i) CROSS JOIN ct2 CROSS JOIN ort
         |ORDER BY dim""".stripMargin,

    // Query clarity (QPP): KL of the top-5 feedback LM vs the corpus
    // LM — stage 1 is the q186 scoring verbatim, each term's log ratio
    // quantized once per (query, term) over identical rational doubles,
    // the final division sign-split.
    "q287_clarity" ->
      s"""WITH $nCte, $tokCte,
         |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
         |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
         |dft AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
         |tot AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM dl),
         |ctf AS (SELECT w, CAST(SUM(tf) AS BIGINT) AS ctf FROM tf GROUP BY w),
         |q(query_id, w) AS (VALUES
         |  (1, 'spark'), (1, 'hash'), (1, 'join'),
         |  (2, 'window'), (2, 'merge'), (2, 'sort'),
         |  (3, 'stream'), (3, 'batch'), (3, 'data')),
         |qi AS (SELECT q.query_id, q.w,
         |         CAST(round(ln(1 + (n - df + 0.5) / (df + 0.5)) * 1e6, 0)
         |              AS BIGINT) AS idf_micro
         |       FROM q JOIN dft USING (w) CROSS JOIN tot),
         |sc AS (SELECT qi.query_id, tf.doc_id,
         |         CAST(SUM(qi.idf_micro *
         |           CAST(CAST(22 AS HUGEINT) * tf.tf * t * 1000000 //
         |                (CAST(10 AS HUGEINT) * t * tf.tf + 3 * t + 9 * dl.dl * n)
         |                AS BIGINT)) AS BIGINT) AS score_e12
         |       FROM qi JOIN tf USING (w) JOIN dl USING (doc_id)
         |            CROSS JOIN tot
         |       GROUP BY qi.query_id, tf.doc_id),
         |fb AS (SELECT query_id, doc_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY score_e12 DESC, doc_id) AS rnk FROM sc) z
         |  WHERE rnk <= 5),
         |tff AS (SELECT fb.query_id, tf.w, CAST(SUM(tf.tf) AS BIGINT) AS tff
         |        FROM fb JOIN tf USING (doc_id) GROUP BY 1, 2),
         |lf AS (SELECT query_id, CAST(SUM(tff) AS BIGINT) AS lenf
         |       FROM tff GROUP BY query_id),
         |nf AS (SELECT query_id, COUNT(*) AS n_fb_docs FROM fb
         |       GROUP BY query_id),
         |kl AS (SELECT tff.query_id, lf.lenf,
         |         tff.tff * CAST(round(ln((CAST(tff.tff AS DOUBLE) * tot.t) /
         |           (CAST(lf.lenf AS DOUBLE) * ctf.ctf)) * 1e6, 0) AS BIGINT)
         |           AS term
         |       FROM tff JOIN lf USING (query_id) JOIN ctf USING (w)
         |            CROSS JOIN tot),
         |ag AS (SELECT query_id, COUNT(*) AS n_terms, MAX(lenf) AS fb_len,
         |         CAST(SUM(term) AS BIGINT) AS num
         |       FROM kl GROUP BY query_id)
         |SELECT ag.query_id, CAST(nf.n_fb_docs AS BIGINT) AS n_fb_docs,
         |       CAST(ag.n_terms AS BIGINT) AS n_terms,
         |       CAST(ag.fb_len AS BIGINT) AS fb_len,
         |       CAST(CASE WHEN num >= 0 THEN num // fb_len
         |            ELSE -((-num) // fb_len) END AS BIGINT) AS clarity_micro
         |FROM ag JOIN nf USING (query_id)
         |ORDER BY ag.query_id""".stripMargin,

    // Dirichlet query-likelihood: matched-term decomposition, both ln
    // terms quantized once to micro-nats over identical integers.
    "q270_dirichlet_ql" ->
      s"""WITH $nCte, $tokCte,
         |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
         |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf
         |       GROUP BY doc_id),
         |tot AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM dl),
         |ctf AS (SELECT w, CAST(SUM(tf) AS BIGINT) AS ctf FROM tf GROUP BY w),
         |q(query_id, w) AS (VALUES
         |  (1, 'spark'), (1, 'hash'), (1, 'join'),
         |  (2, 'window'), (2, 'merge'), (2, 'sort'),
         |  (3, 'stream'), (3, 'batch'), (3, 'data')),
         |qt AS (SELECT q.query_id, q.w, ctf.ctf, tot.t
         |       FROM q JOIN ctf USING (w) CROSS JOIN tot),
         |nq AS (SELECT query_id, COUNT(*) AS nq FROM qt GROUP BY query_id),
         |mt AS (SELECT qt.query_id, tf.doc_id,
         |         CAST(SUM(CAST(round(ln(1.0 + CAST(tf.tf AS DOUBLE) * qt.t
         |           / (50.0 * qt.ctf)) * 1e6, 0) AS BIGINT)) AS BIGINT)
         |           AS s_match
         |       FROM qt JOIN tf USING (w)
         |       GROUP BY 1, 2),
         |sc AS (SELECT mt.query_id, mt.doc_id,
         |         mt.s_match + nq.nq * CAST(round(
         |           ln(50.0 / (dl.dl + 50.0)) * 1e6, 0) AS BIGINT)
         |           AS score_micro
         |       FROM mt JOIN dl USING (doc_id) JOIN nq USING (query_id)),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |         ORDER BY score_micro DESC, doc_id) AS rnk FROM sc)
         |SELECT query_id, CAST(rnk AS INT) AS rank, doc_id,
         |       CAST(score_micro AS BIGINT) AS score_micro
         |FROM rk WHERE rnk <= 10
         |ORDER BY query_id, rank""".stripMargin,

    // Label-noise by k-NN disagreement over the q267 descent graph:
    // neighbor-label majority (ties smallest), suspects per label.
    "q276_label_noise" ->
      s"""WITH $embCte,
         |$knnDescentCtes,
         |lb AS (SELECT vec_id AS id, CAST(label AS BIGINT) AS label
         |       FROM embeddings),
         |vt AS (SELECT ds.id, lb.label AS nlab, COUNT(*) AS c
         |       FROM ds JOIN lb ON lb.id = ds.nid GROUP BY 1, 2),
         |mj AS (SELECT id, nlab AS maj_label FROM (
         |         SELECT *, row_number() OVER (PARTITION BY id
         |           ORDER BY c DESC, nlab) AS rk FROM vt) z
         |       WHERE rk = 1)
         |SELECT lb.label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
         |       CAST(SUM(CASE WHEN mj.maj_label IS NULL THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_no_neighbors,
         |       CAST(SUM(CASE WHEN mj.maj_label IS NOT NULL
         |                 AND mj.maj_label <> lb.label THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_suspect,
         |       CAST(CASE WHEN COUNT(*) - SUM(CASE WHEN mj.maj_label IS NULL
         |                 THEN 1 ELSE 0 END) = 0 THEN 0
         |            ELSE SUM(CASE WHEN mj.maj_label IS NOT NULL
         |                 AND mj.maj_label <> lb.label THEN 1 ELSE 0 END)
         |                 * 1000000 // (COUNT(*) - SUM(CASE WHEN
         |                 mj.maj_label IS NULL THEN 1 ELSE 0 END)) END
         |         AS BIGINT) AS suspect_ppm
         |FROM lb LEFT JOIN mj ON mj.id = lb.id
         |GROUP BY lb.label
         |ORDER BY lb.label""".stripMargin,

    // Ranker agreement: RBO@10 (p = 9/10, exact rational over the
    // 2520·10^10 denominator) between the q186 BM25 and q270 QL lists.
    "q273_rbo_agreement" ->
      s"""WITH $nCte, $tokCte,
         |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
         |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf
         |       GROUP BY doc_id),
         |dft AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
         |tot AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM dl),
         |ctf AS (SELECT w, CAST(SUM(tf) AS BIGINT) AS ctf FROM tf GROUP BY w),
         |q(query_id, w) AS (VALUES
         |  (1, 'spark'), (1, 'hash'), (1, 'join'),
         |  (2, 'window'), (2, 'merge'), (2, 'sort'),
         |  (3, 'stream'), (3, 'batch'), (3, 'data')),
         |qi AS (SELECT q.query_id, q.w,
         |         CAST(round(ln(1 + (n - df + 0.5) / (df + 0.5)) * 1e6, 0)
         |              AS BIGINT) AS idf_micro
         |       FROM q JOIN dft USING (w) CROSS JOIN tot),
         |scA AS (SELECT qi.query_id, tf.doc_id,
         |         CAST(SUM(qi.idf_micro *
         |           CAST(CAST(22 AS HUGEINT) * tf.tf * t * 1000000 //
         |                (CAST(10 AS HUGEINT) * t * tf.tf + 3 * t + 9 * dl.dl * n)
         |                AS BIGINT)) AS BIGINT) AS score_e12
         |       FROM qi JOIN tf USING (w) JOIN dl USING (doc_id)
         |            CROSS JOIN tot
         |       GROUP BY qi.query_id, tf.doc_id),
         |rkA AS (SELECT query_id, doc_id, rnk FROM (
         |          SELECT *, row_number() OVER (PARTITION BY query_id
         |            ORDER BY score_e12 DESC, doc_id) AS rnk FROM scA) z
         |        WHERE rnk <= 10),
         |qt AS (SELECT q.query_id, q.w, ctf.ctf, tot.t
         |       FROM q JOIN ctf USING (w) CROSS JOIN tot),
         |nq AS (SELECT query_id, COUNT(*) AS nq FROM qt GROUP BY query_id),
         |mtB AS (SELECT qt.query_id, tf.doc_id,
         |         CAST(SUM(CAST(round(ln(1.0 + CAST(tf.tf AS DOUBLE) * qt.t
         |           / (50.0 * qt.ctf)) * 1e6, 0) AS BIGINT)) AS BIGINT)
         |           AS s_match
         |       FROM qt JOIN tf USING (w)
         |       GROUP BY 1, 2),
         |scB AS (SELECT mtB.query_id, mtB.doc_id,
         |         mtB.s_match + nq.nq * CAST(round(
         |           ln(50.0 / (dl.dl + 50.0)) * 1e6, 0) AS BIGINT)
         |           AS score_micro
         |       FROM mtB JOIN dl USING (doc_id) JOIN nq USING (query_id)),
         |rkB AS (SELECT query_id, doc_id, rnk FROM (
         |          SELECT *, row_number() OVER (PARTITION BY query_id
         |            ORDER BY score_micro DESC, doc_id) AS rnk FROM scB) z
         |        WHERE rnk <= 10),
         |mm AS (SELECT a.query_id, GREATEST(a.rnk, b.rnk) AS m
         |       FROM rkA a JOIN rkB b USING (query_id, doc_id)),
         |wt(d, w8) AS (VALUES $rboWtValues),
         |nm2 AS (SELECT mm.query_id,
         |          CAST(SUM(CAST(w8 AS HUGEINT)) AS HUGEINT) AS num
         |        FROM mm JOIN wt ON mm.m <= wt.d GROUP BY 1),
         |nc AS (SELECT query_id, COUNT(*) AS n_common FROM mm GROUP BY 1),
         |qs AS (SELECT DISTINCT query_id FROM rkA)
         |SELECT qs.query_id,
         |       CAST(COALESCE(nc.n_common, 0) AS BIGINT) AS n_common,
         |       CAST(COALESCE(num, 0) * 1000000 // $rboDenMin AS BIGINT)
         |         AS rbo_min_ppm,
         |       CAST(COALESCE(num, 0) * 1000000 // $rboDenNorm AS BIGINT)
         |         AS rbo_norm_ppm
         |FROM qs LEFT JOIN nm2 USING (query_id) LEFT JOIN nc USING (query_id)
         |ORDER BY query_id""".stripMargin,

    // Embedding-space drift: per-dim centroid shift (e6 ints,
    // sign-split floor division) + value-bin PSI between the even/odd
    // vec_id halves, +1-smoothed (the q242 PSI contract).
    "q269_embedding_drift" ->
      s"""WITH ex AS (SELECT vec_id % 2 AS half, CAST(g - 1 AS INT) AS dim,
         |         CAST(emb[g] AS DOUBLE) AS v
         |       FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         |               unnest(range(1, 65)) AS g FROM embeddings) z),
         |cells AS (SELECT dim, half,
         |            CAST(ROUND(v * 8, 0) AS BIGINT) AS bin, COUNT(*) AS c,
         |            SUM(CAST(ROUND(v * 1000000, 0) AS BIGINT)) AS sv
         |          FROM ex GROUP BY 1, 2, 3),
         |cent AS (SELECT dim, half, SUM(c) AS n, SUM(sv) AS s FROM cells
         |         GROUP BY 1, 2),
         |ce AS (SELECT dim, half,
         |         n, CASE WHEN s < 0 THEN -((-s) // n) ELSE s // n END AS c_e6
         |       FROM cent),
         |cw AS (SELECT dim,
         |         MAX(CASE WHEN half = 0 THEN n END) AS n_ref,
         |         MAX(CASE WHEN half = 1 THEN n END) AS n_cur,
         |         MAX(CASE WHEN half = 0 THEN c_e6 END) AS c_ref_e6,
         |         MAX(CASE WHEN half = 1 THEN c_e6 END) AS c_cur_e6
         |       FROM ce GROUP BY dim),
         |rf AS (SELECT dim, bin, c AS cr FROM cells WHERE half = 0),
         |cu AS (SELECT dim, bin, c AS cc FROM cells WHERE half = 1),
         |spn AS (SELECT COALESCE(rf.dim, cu.dim) AS dim,
         |          COALESCE(rf.bin, cu.bin) AS bin,
         |          COALESCE(cr, 0) + 1 AS cr1, COALESCE(cc, 0) + 1 AS cc1
         |        FROM rf FULL OUTER JOIN cu
         |          ON rf.dim = cu.dim AND rf.bin = cu.bin),
         |tt AS (SELECT dim, SUM(cr1) AS nr, SUM(cc1) AS nc,
         |         COUNT(*) AS n_bins FROM spn GROUP BY dim),
         |psi AS (SELECT s.dim, MAX(t.n_bins) AS n_bins,
         |          SUM((s.cr1 * 1000000 // t.nr - s.cc1 * 1000000 // t.nc)
         |            * CAST(ROUND(LN((CAST(s.cr1 AS DOUBLE) / t.nr)
         |                / (CAST(s.cc1 AS DOUBLE) / t.nc)) * 1e6, 0)
         |              AS BIGINT)) AS sm
         |        FROM spn s JOIN tt t ON t.dim = s.dim GROUP BY s.dim)
         |SELECT cw.dim, CAST(cw.n_ref AS BIGINT) AS n_ref,
         |       CAST(cw.n_cur AS BIGINT) AS n_cur,
         |       CAST(cw.c_ref_e6 AS BIGINT) AS c_ref_e6,
         |       CAST(cw.c_cur_e6 AS BIGINT) AS c_cur_e6,
         |       CAST(ABS(cw.c_ref_e6 - cw.c_cur_e6) AS BIGINT) AS shift_e6,
         |       CAST(psi.n_bins AS INT) AS n_bins,
         |       CAST(GREATEST(0, psi.sm) // 1000000 AS BIGINT) AS psi_micro
         |FROM cw JOIN psi ON psi.dim = cw.dim
         |ORDER BY cw.dim""".stripMargin,
  )
}
