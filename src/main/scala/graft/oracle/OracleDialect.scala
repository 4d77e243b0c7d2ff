package graft.oracle

/** Shared DuckDB-dialect SQL fragments for the oracle objects: the
  * money-cents parity idiom, the normalized-text / shingle-hash /
  * minhash CTE builders (mirroring graft.ext.TextOps and friends with
  * the same integer constants), and the generated full-query SQL for
  * the iterative operators. Extracted verbatim from SparkEntry.scala
  * (round 11) so no single file carries all 265 oracle strings.
  */
object OracleDialect {
  // Shared SQL fragments for the exact money-sum idiom (Parity.scala).
  private[graft] def cents(c: String) = s"CAST(ROUND($c*100,0) AS BIGINT)"
  private[graft] def moneySum(c: String) = s"CAST(SUM(${cents(c)}) AS DOUBLE)/100.0"
  private[graft] def moneyAvg(c: String) = s"CAST(SUM(${cents(c)}) AS DOUBLE)/100.0/COUNT($c)"

  // Shared SQL fragments for the graft.ext text/similarity operators.
  // These mirror graft.ext.TextOps/TextDedup/Similarity exactly: same
  // normalization, same integer hash constants (generated from the same
  // Scala values), so Spark and DuckDB compute identical integers.
  /** lower+trim+collapse-whitespace — TextOps.normText. */
  private[graft] val nCte =
    """n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t FROM documents)"""
  private[graft] val tokCte =
    "tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM n)"
  /** distinct char-8-gram shingle HASHES — TextDedup.docShingleHashes:
    * hash first, distinct over the hash values (set semantics over hv on
    * both engines). `unnest(range(...))` rather than a lateral
    * `generate_series`, which DuckDB's binder rejects with correlated
    * arguments. */
  private[graft] def char8HashCte =
    "h AS (SELECT DISTINCT doc_id, " + hv8("substr(t, g, 8)") + " AS hv " +
      "FROM (SELECT doc_id, t, unnest(range(1, length(t)-6)) AS g FROM n) z)"
  /** TextOps.hash8 over an 8-char column: polynomial ord-hash mod 2^31-1.
    * ord() is INT32 in DuckDB — cast before multiplying. */
  private[graft] def hv8(c: String): String = {
    val terms = graft.ext.TextOps.Pow31.zipWithIndex.map { case (w, i) =>
      s"CAST(ord(substr($c,${i + 1},1)) AS BIGINT)*$w"
    }
    s"(${terms.mkString(" + ")}) % ${graft.ext.TextOps.HashP}"
  }
  /** TextDedup.Perms as a VALUES relation. */
  private[graft] val permValues = graft.ext.TextDedup.Perms
    .map { case (j, band, slot, a, b, w) => s"($j,$band,$slot,$a,$b,$w)" }
    .mkString(",")
  /** Shared CTE chain for the MinHash+LSH tier — q34 (pairs) and q47
    * (cluster edges) both consume it: char-8-gram shingle hashes →
    * one-aggregation 16-min signature → band hashes → band-collision
    * candidates → exact-Jaccard sizes (`sz`) and intersections (`iv`).
    * Mirrors TextDedup.minhashLshPairs. */
  private[graft] def minhashCtes =
    s"""$char8HashCte,
       |perm AS (SELECT * FROM (VALUES $permValues) AS p(j, band, slot, a, b, w)),
       |sig AS (SELECT doc_id, j, band, w,
       |               MIN((hv*a + b) % ${graft.ext.TextOps.HashP}) AS mh
       |        FROM h CROSS JOIN perm GROUP BY doc_id, j, band, w),
       |bh AS (SELECT doc_id, band, CAST(SUM(mh*w) AS BIGINT) AS band_hash
       |       FROM sig GROUP BY doc_id, band),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM bh x JOIN bh y
       |           ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM h GROUP BY doc_id),
       |iv AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
       |       FROM cand c
       |       JOIN h sa ON sa.doc_id = c.doc_a
       |       JOIN h sb ON sb.doc_id = c.doc_b AND sb.hv = sa.hv
       |       GROUP BY 1, 2)""".stripMargin
  /** q223's h-index coreness oracle, the 24 fixed rounds UNROLLED —
    * machine-generated CTE chain (round t: neighbor values ranked
    * descending per node, h = max(least(rank, value))), every stage
    * MATERIALIZED because `ed` is referenced by all 24 rounds and each
    * c_t by the next (inlining would nest the plan exponentially). */
  private[graft] lazy val corenessSql: String = {
    val rounds = 24
    val roundCtes = (0 until rounds).map { t =>
      s"""r$t AS MATERIALIZED (SELECT e.u AS node, c.c AS nc,
         |  row_number() OVER (PARTITION BY e.u ORDER BY c.c DESC) AS rk
         |  FROM ed e JOIN c$t c ON c.node = e.v),
         |c${t + 1} AS MATERIALIZED (SELECT node,
         |  CAST(MAX(LEAST(rk, nc)) AS BIGINT) AS c
         |  FROM r$t GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH it AS MATERIALIZED (SELECT DISTINCT l_orderkey AS oid,
       |         l_partkey AS item FROM lineitem),
       |pr AS MATERIALIZED (SELECT a.item AS u, b.item AS v
       |  FROM it a JOIN it b ON a.oid = b.oid AND a.item < b.item
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |ed AS MATERIALIZED (SELECT u, v FROM pr UNION ALL SELECT v, u FROM pr),
       |c0 AS MATERIALIZED (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM ed GROUP BY 1),
       |$roundCtes,
       |chg AS (SELECT CAST(SUM(CASE WHEN a.c <> b.c THEN 1 ELSE 0 END)
       |          AS BIGINT) AS n_changed
       |        FROM c$rounds a JOIN c${rounds - 1} b ON a.node = b.node)
       |SELECT CAST(a.node AS BIGINT) AS part, d.c AS degree,
       |       a.c AS coreness,
       |       CAST(CASE WHEN n_changed = 0 THEN 1 ELSE 0 END AS INT)
       |         AS converged
       |FROM c$rounds a JOIN c0 d ON a.node = d.node CROSS JOIN chg
       |ORDER BY part""".stripMargin
  }

  /** q228's MMR oracle: candidates = exact top-10 per q37 query, pair
    * sims quantized to e4 integers, then FIVE greedy selection rounds
    * unrolled (pick 1 by relevance; each later round is an anti join
    * against the selected set, a max-sim rollup over it, and an argmax
    * of the integer objective 7·rel − 3·maxsim with ties to the
    * smallest id) — generated, like corenessSql, so both engines run
    * the identical fixed schedule. */
  private[graft] lazy val mmrSql: String = {
    val steps = (2 to 5).map { t =>
      val prev = s"sall${t - 1}"
      s"""r$t AS (SELECT c.qid, c.cid, c.rel_e4, MAX(s.sim_e4) AS ms
         |  FROM cand c
         |  LEFT JOIN $prev x ON c.qid = x.qid AND c.cid = x.cid
         |  JOIN $prev p ON c.qid = p.qid
         |  JOIN sims s ON s.qid = c.qid AND s.a = c.cid AND s.b = p.cid
         |  WHERE x.cid IS NULL
         |  GROUP BY 1, 2, 3),
         |s$t AS (SELECT qid, cid, $t AS mmr_rank FROM (
         |  SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |    ORDER BY 7*rel_e4 - 3*ms DESC, cid) AS rn FROM r$t) z
         |  WHERE rn = 1),
         |sall$t AS (SELECT qid, cid, mmr_rank FROM sall${t - 1}
         |  UNION ALL SELECT qid, cid, mmr_rank FROM s$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH $embCte,
       |qv AS (SELECT * FROM nm WHERE vec_id < 10),
       |sc AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
       |         ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4)
       |           AS score
       |       FROM nm c CROSS JOIN qv q WHERE c.vec_id <> q.vec_id),
       |cand AS (SELECT qid, cid,
       |           CAST(round(score*10000, 0) AS BIGINT) AS rel_e4,
       |           row_number() OVER (PARTITION BY qid
       |             ORDER BY score DESC, cid) AS rnk
       |         FROM sc QUALIFY rnk <= 10),
       |ce AS (SELECT cand.qid, cand.cid, nm.emb, nm.nrm
       |       FROM cand JOIN nm ON cand.cid = nm.vec_id),
       |sims AS (SELECT a.qid, a.cid AS a, b.cid AS b,
       |           CAST(round(list_dot_product(a.emb, b.emb)
       |                /(a.nrm*b.nrm)*10000, 0) AS BIGINT) AS sim_e4
       |         FROM ce a JOIN ce b ON a.qid = b.qid AND a.cid <> b.cid),
       |s1 AS (SELECT qid, cid, 1 AS mmr_rank FROM (
       |  SELECT qid, cid, row_number() OVER (PARTITION BY qid
       |    ORDER BY rel_e4 DESC, cid) AS rn FROM cand) z WHERE rn = 1),
       |sall1 AS (SELECT qid, cid, mmr_rank FROM s1),
       |$steps
       |SELECT s.qid AS query_id, CAST(s.mmr_rank AS INT) AS mmr_rank,
       |       s.cid AS neighbor_id, cand.rel_e4
       |FROM sall5 s JOIN cand ON s.qid = cand.qid AND s.cid = cand.cid
       |ORDER BY query_id, mmr_rank""".stripMargin
  }

  /** Multimodal.embedWeight row k over 64 columns as a DuckDB DOUBLE[]
    * literal — the q224 reranker's frozen projection matrix. */
  private[graft] def wLit(k: Int): String =
    (0 until 64).map(j => s"${graft.ext.Multimodal.embedWeight(k, j)}.0")
      .mkString("[", ",", "]")

  /** Similarity.planes(4, 64) as DuckDB DOUBLE[] literals. */
  private[graft] def planeLit(m: Int): String =
    graft.ext.Similarity.planes(4, 64)(m).map(x => s"$x.0").mkString("[", ",", "]")
  /** Generator plane ROW m (any m — the q267 second LSH table uses
    * rows 4–7) as a DuckDB DOUBLE[] literal. */
  private[graft] def planeRowLit(m: Int): String =
    graft.ext.Similarity.planesFrom(m, 1, 64).head
      .map(x => s"$x.0").mkString("[", ",", "]")
  /** TextDedup.simhashFingerprints' 32 conditional-sum vote columns — the
    * same single-aggregation shape as the Spark side (no bit cross join). */
  private[graft] val simhashVoteCols = (0 until 32)
    .map(b => s"SUM(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v_$b")
    .mkString(", ")
  private[graft] val simhashFpExpr = (0 until 32)
    .map(b => s"(CASE WHEN v_$b > 0 THEN ${1L << b} ELSE 0 END)")
    .mkString(" + ")
  /** Full-length 31-Horner rolling hash mod 2³¹-1 of a string expression —
    * GraftTextKernels.wordNgramHashFull's per-span math (token identity
    * for the repetition stats). */
  private[graft] def fullHash(c: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range(1, length($c)+1),
       |    i -> CAST(ord(substr($c, i, 1)) AS BIGINT))),
       |  (h, c) -> (h * 31 + c) % ${graft.ext.TextOps.HashP})""".stripMargin
  /** Sampling.bucket100 over doc_id (same mod-P-before-multiply
    * reduction as the Scala side — identical values for keys < P, no
    * overflow beyond). */
  private[graft] val bucketExpr =
    s"(((doc_id % ${graft.ext.TextOps.HashP}) * 1000003 + 12345) % ${graft.ext.TextOps.HashP}) % 100"
  /** Multimodal retrieval feature CTEs (q177/q178): per VIDEO doc, the
    * 8-bucket exact integer-ppm histogram of the LZW-expanded pixels.
    * Mirrors Multimodal.gifPayload's fill arithmetic (pixels = text
    * bytes mod 128 cycled across npx = frames·w·h pixels, k never
    * resetting between frames) and gifPixelHistogramPpm's bucketing
    * ((v mod 128) div 16) + scaling (count·10⁶ div npx). Empty text →
    * all-zero pixels → bucket 0 holds every count. */
  private[graft] def mmFeatureCtes =
    """v AS (SELECT doc_id, text,
      |             CAST(1 + doc_id % 32 AS INT) AS vw,
      |             CAST(1 + (doc_id*3) % 32 AS INT) AS vh,
      |             CAST(1 + doc_id % 10 AS INT) AS vf,
      |             length(text) AS len
      |      FROM documents WHERE doc_id % 3 = 2),
      |g AS (SELECT doc_id, text, len, CAST(vf AS BIGINT)*vw*vh AS npx FROM v),
      |bb AS (SELECT doc_id, gi,
      |              (ord(substr(text, CAST(gi + 1 AS INT), 1)) % 128) // 16 AS bk
      |       FROM (SELECT doc_id, text, unnest(range(len)) AS gi FROM g) z),
      |ball AS (SELECT doc_id, bk, COUNT(*) AS c_all FROM bb GROUP BY doc_id, bk),
      |bpre AS (SELECT bb.doc_id, bb.bk, COUNT(*) AS c_pre
      |         FROM bb JOIN g ON bb.doc_id = g.doc_id
      |         WHERE bb.gi < g.npx % g.len GROUP BY bb.doc_id, bb.bk),
      |spine AS (SELECT g.doc_id, CAST(u.b AS INT) AS bk, g.npx, g.len
      |          FROM g CROSS JOIN (SELECT unnest(range(8)) AS b) u),
      |hist AS (SELECT s.doc_id, s.bk,
      |                CASE WHEN s.len = 0
      |                     THEN CASE WHEN s.bk = 0 THEN s.npx ELSE 0 END
      |                     ELSE (s.npx // s.len) * COALESCE(a.c_all, 0)
      |                          + COALESCE(p.c_pre, 0) END AS cnt,
      |                s.npx
      |         FROM spine s
      |         LEFT JOIN ball a ON a.doc_id = s.doc_id AND a.bk = s.bk
      |         LEFT JOIN bpre p ON p.doc_id = s.doc_id AND p.bk = s.bk),
      |f AS (SELECT doc_id,
      |             list(CAST(cnt * 1000000 // npx AS BIGINT) ORDER BY bk) AS fv
      |      FROM hist GROUP BY doc_id)""".stripMargin
  /** Exact integer dot product of the two 8-long feature lists. */
  private[graft] def mmDotExpr =
    (1 to 8).map(i => s"q.qf[$i]*c.fv[$i]").mkString(" + ")
  /** One output row of the frozen-weight embedding stand-in
    * (Multimodal.embedWeight: W(k,j) = ((37k+11j+5) mod 17) − 8),
    * inlined as literal integer coefficients over the 8-long ppm
    * feature list. */
  private[graft] def mmEmbCol(k: Int): String =
    (0 until 8).map { j =>
      val w = ((37 * k + 11 * j + 5) % 17) - 8
      s"($w)*fv[${j + 1}]"
    }.mkString(" + ")
  /** Normalized double-precision embeddings with L2 norm. */
  private[graft] val embCte =
    "nm AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb, " +
      "sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings)"

  private[graft] lazy val hybridRrfSql: String =
    s"""WITH $nCte, $tokCte,
         |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
         |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
         |dft AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
         |tot AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM dl),
         |q AS (SELECT DISTINCT doc_id AS query_id, w FROM tok WHERE doc_id < 10),
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
         |       WHERE tf.doc_id <> qi.query_id
         |       GROUP BY qi.query_id, tf.doc_id),
         |lex AS (SELECT query_id, doc_id AS neighbor_id,
         |          row_number() OVER (PARTITION BY query_id
         |            ORDER BY score_e12 DESC, doc_id) AS rank
         |        FROM sc QUALIFY rank <= 10),
         |den AS (SELECT query_id, neighbor_id, rank FROM ($annBruteSql) zd),
         |u AS (SELECT query_id, neighbor_id, 1000000 // (60 + rank) AS c FROM lex
         |      UNION ALL
         |      SELECT query_id, neighbor_id, 1000000 // (60 + rank) FROM den),
         |f AS (SELECT query_id, neighbor_id,
         |             CAST(SUM(c) AS BIGINT) AS rrf_micro,
         |             CAST(COUNT(*) AS INT) AS n_lists
         |      FROM u GROUP BY query_id, neighbor_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |         ORDER BY rrf_micro DESC, neighbor_id) AS rnk FROM f)
         |SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id, rrf_micro,
         |       n_lists
         |FROM rk WHERE rnk <= 5
         |ORDER BY query_id, rank""".stripMargin

  private[graft] lazy val annBruteSql: String =
    s"""WITH $embCte,
       |q AS (SELECT * FROM nm WHERE vec_id < 10),
       |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |              ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) AS score
       |       FROM nm c CROSS JOIN q WHERE c.vec_id <> q.vec_id),
       |rk AS (SELECT query_id, neighbor_id, score,
       |              row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
       |       FROM sc)
       |SELECT query_id, neighbor_id, score, CAST(rnk AS INT) AS rank
       |FROM rk WHERE rnk <= 5
       |ORDER BY query_id, rank""".stripMargin

  private[graft] lazy val annLshSql: String =
    s"""WITH $embCte,
       |bk AS (SELECT vec_id, emb, nrm,
       |    (CASE WHEN list_dot_product(emb, ${planeLit(0)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeLit(1)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeLit(2)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeLit(3)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS bucket
       |  FROM nm),
       |q AS (SELECT * FROM bk WHERE vec_id < 10),
       |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.bucket,
       |              ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) AS score
       |       FROM bk c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.vec_id),
       |rk AS (SELECT query_id, neighbor_id, bucket, score,
       |              row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
       |       FROM sc)
       |SELECT query_id, neighbor_id, bucket, score, CAST(rnk AS INT) AS rank
       |FROM rk WHERE rnk <= 3
       |ORDER BY query_id, rank""".stripMargin

  private[graft] lazy val annIvfSql: String =
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
         |q AS (SELECT vec_id, emb, nrm FROM nm WHERE vec_id < 10),
         |pr AS (SELECT q.vec_id AS query_id, cn.cell,
         |              row_number() OVER (PARTITION BY q.vec_id
         |                ORDER BY ROUND(list_dot_product(q.emb, cn.centroid)/(q.nrm*cn.cnrm), 4) DESC,
         |                         cn.cell) AS prk
         |       FROM q CROSS JOIN cn),
         |probed AS (SELECT query_id, cell FROM pr WHERE prk <= 2),
         |sc AS (SELECT p.query_id, c.vec_id AS neighbor_id, c.label AS cell,
         |              ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) AS score
         |       FROM probed p
         |       JOIN nm c ON c.label = p.cell
         |       JOIN nm q ON q.vec_id = p.query_id
         |       WHERE c.vec_id <> p.query_id),
         |rk AS (SELECT query_id, neighbor_id, cell, score,
         |              row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
         |       FROM sc)
         |SELECT query_id, neighbor_id, cell, score, CAST(rnk AS INT) AS rank
         |FROM rk WHERE rnk <= 3
         |ORDER BY query_id, rank""".stripMargin

  /** q232 BPE encode: 6 unrolled merge rounds (generated). Each round
    * picks the current frequency-weighted argmax adjacent symbol pair
    * (ties by pair text) and merges leftmost-first non-overlapping via
    * the run trick — a running match count splits runs, the run-min
    * anchors even offsets. Mirrors graft.ext.Bpe.bpeSegment exactly. */
  private[graft] lazy val bpeSql: String =
    s"""WITH ${bpeChainCtes(6)},
       |seg AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_pieces,
       |          string_agg(sym, ' ' ORDER BY pos) AS segmentation
       |        FROM s6 GROUP BY w)
       |SELECT v.w AS word, v.freq, CAST(length(v.w) AS BIGINT) AS n_chars,
       |       seg.n_pieces, CAST(v.freq * seg.n_pieces AS BIGINT) AS corpus_pieces,
       |       seg.segmentation
       |FROM bvocab v JOIN seg USING (w)
       |ORDER BY freq DESC, word LIMIT 40""".stripMargin

  /** One merge round's leftmost-first non-overlapping APPLICATION
    * CTEs (the run trick) — reads p$$r (the lead-paired state) and b$$r
    * (the 1-row pick), emits s$$r. Shared by the BPE chain below and
    * the WordPiece chain ([[OracleText]]), whose lineages differ only
    * in the pick rule. */
  private[graft] def mergeApplyCtes(r: Int, tag: String = ""): String =
    s"""m$tag$r AS (SELECT p.w, p.pos, p.sym, p.nxt,
       |          COALESCE(p.sym = b.a AND p.nxt = b.b, false) AS is_match
       |        FROM p$tag$r p CROSS JOIN b$tag$r b),
       |m2$tag$r AS (SELECT *, SUM(CASE WHEN is_match THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY w ORDER BY pos) AS mk FROM m$tag$r),
       |m3$tag$r AS (SELECT *, pos - mk AS grp FROM m2$tag$r),
       |m4$tag$r AS (SELECT *, MIN(CASE WHEN is_match THEN pos END)
       |           OVER (PARTITION BY w, grp) AS rs FROM m3$tag$r),
       |m5$tag$r AS (SELECT *, (is_match AND (pos - rs) % 2 = 0) AS applied
       |         FROM m4$tag$r),
       |m6$tag$r AS (SELECT *, COALESCE(lag(applied)
       |           OVER (PARTITION BY w ORDER BY pos), false) AS absorbed
       |         FROM m5$tag$r),
       |s$tag$r AS (SELECT w,
       |          row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS pos,
       |          CASE WHEN applied THEN sym || nxt ELSE sym END AS sym
       |        FROM m6$tag$r WHERE NOT absorbed)""".stripMargin

  /** The shared vocabulary + character-state prefix of both trainer
    * chains: bvocab (word, freq) and s0 (per-character symbol rows). */
  private[graft] lazy val trainerBaseCtes: String =
    s"""$nCte,
       |bvocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(string_split(t, ' ')) AS w FROM n) z
       |  WHERE regexp_matches(w, '^[a-z]+$$') GROUP BY w),
       |s0 AS (SELECT w, CAST(g AS BIGINT) AS pos,
       |         substr(w, CAST(g + 1 AS INT), 1) AS sym
       |       FROM (SELECT w, unnest(range(0, length(w))) AS g FROM bvocab) z)""".stripMargin

  /** The shared BPE training CTE chain (vocab, char state, `rounds`
    * unrolled merge rounds) used by q232/q237/q238 — bf$$r carries each
    * round's argmax pair with its weighted count, s$$r the post-merge
    * symbol state. */
  /** The BPE round CTEs alone (no vocabulary base) — composable with
    * other chains in one statement (q317). */
  private[graft] def bpeRoundCtes(rounds: Int, tag: String = ""): String =
    (1 to rounds).map { r =>
      val prev = if (r == 1) "s0" else s"s$tag${r - 1}"
      s"""p$tag$r AS (SELECT w, pos, sym,
         |         lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
         |       FROM $prev),
         |bf$tag$r AS (SELECT a, b, cnt FROM (
         |    SELECT p.sym AS a, p.nxt AS b, CAST(SUM(v.freq) AS BIGINT) AS cnt
         |    FROM p$tag$r p JOIN bvocab v USING (w)
         |    WHERE p.nxt IS NOT NULL GROUP BY 1, 2) z
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |b$tag$r AS (SELECT a, b FROM bf$tag$r),
         |${mergeApplyCtes(r, tag)}""".stripMargin
    }.mkString(",\n")

  private[graft] def bpeChainCtes(rounds: Int, tag: String = ""): String =
    s"""$trainerBaseCtes,
       |${bpeRoundCtes(rounds, tag)}""".stripMargin

  /** The WordPiece training chain, tagged so it can share one
    * statement with the BPE chain (q317's three-lineage fertility
    * readout): identical mechanics ([[mergeApplyCtes]]) with the
    * likelihood-ratio pick — mirrors graft.ext.WordPiece. Reads
    * `bvocab`/`s0` from [[trainerBaseCtes]] (caller includes those
    * once); emits wf$$tag$$r (the pick rows) and s$$tag$$r states. */
  private[graft] def wpRoundCtes(rounds: Int, tag: String): String =
    (1 to rounds).map { r =>
      val prev = if (r == 1) "s0" else s"s$tag${r - 1}"
      s"""p$tag$r AS MATERIALIZED (SELECT w, pos, sym,
         |         lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
         |       FROM $prev),
         |u$tag$r AS MATERIALIZED (
         |        SELECT p.sym, CAST(SUM(v.freq) AS BIGINT) AS ucnt
         |        FROM p$tag$r p JOIN bvocab v USING (w) GROUP BY 1),
         |wf$tag$r AS MATERIALIZED (SELECT a, b, cnt, ca, cb,
         |           CAST(CAST(cnt AS HUGEINT) * 1000000000000
         |             // (CAST(ca AS HUGEINT) * cb) AS BIGINT)
         |             AS score_pico
         |         FROM (SELECT z.a, z.b, z.cnt,
         |                 ua.ucnt AS ca, ub.ucnt AS cb
         |               FROM (SELECT p.sym AS a, p.nxt AS b,
         |                       CAST(SUM(v.freq) AS BIGINT) AS cnt
         |                     FROM p$tag$r p JOIN bvocab v USING (w)
         |                     WHERE p.nxt IS NOT NULL GROUP BY 1, 2) z
         |               JOIN u$tag$r ua ON ua.sym = z.a
         |               JOIN u$tag$r ub ON ub.sym = z.b) zz
         |  ORDER BY score_pico DESC, a, b LIMIT 1),
         |b$tag$r AS (SELECT a, b FROM wf$tag$r),
         |${mergeApplyCtes(r, tag)}""".stripMargin
    }.mkString(",\n")

  /** Exact char-8-gram Jaccard pair CTEs over the df-capped space
    * (needs `h` from [[char8HashCte]] in scope) — shared by the q244
    * candidate eval and the q248 threshold sweep. Mirrors
    * TextDedup.jaccardJoined. */
  private[graft] def exactJaccardCtes: String =
    s"""hot AS (SELECT hv FROM h GROUP BY hv
       |        HAVING COUNT(*) > ${graft.ext.TextDedup.DefaultMaxDf}),
       |hc AS (SELECT * FROM h WHERE hv NOT IN (SELECT hv FROM hot)),
       |szc AS (SELECT doc_id, COUNT(*) AS n FROM hc GROUP BY doc_id),
       |ivc AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |          COUNT(*) AS n_inter
       |        FROM hc a JOIN hc b ON a.hv = b.hv AND a.doc_id < b.doc_id
       |        GROUP BY 1, 2),
       |jp AS (SELECT doc_a, doc_b, n_inter, za.n + zb.n - n_inter AS u
       |       FROM ivc JOIN szc za ON za.doc_id = ivc.doc_a
       |            JOIN szc zb ON zb.doc_id = ivc.doc_b)""".stripMargin

  /** q263 LPA-communities oracle (generated): 4 synchronous label-
    * propagation rounds unrolled as CTEs (each round votes over the
    * previous round's labels, argmax by count desc then smallest
    * label), then Newman modularity of the final partition in exact
    * HUGEINT up to the one-row e6 rounding. */
  /** The q263 LPA label-loop CTE chain (edge build + `rounds` unrolled
    * synchronous rounds ending at l`rounds`) — shared by the modularity
    * (q263) and conductance (q279) oracles. */
  private[graft] def lpaCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { t =>
      s"""v$t AS (SELECT dd.u AS node, l.lab, COUNT(*) AS c
         |       FROM dd JOIN l${t - 1} l ON dd.v = l.node GROUP BY 1, 2),
         |l$t AS (SELECT node, lab FROM (SELECT node, lab,
         |         row_number() OVER (PARTITION BY node
         |           ORDER BY c DESC, lab) AS rk FROM v$t) z
         |       WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""it AS (SELECT DISTINCT l_orderkey AS oid, l_partkey AS item
       |            FROM lineitem),
       |prx AS (SELECT a.item AS u, b.item AS v
       |        FROM it a JOIN it b ON a.oid = b.oid AND a.item < b.item
       |        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |dd AS (SELECT u, v FROM prx UNION ALL SELECT v, u FROM prx),
       |l0 AS (SELECT DISTINCT u AS node, u AS lab FROM dd),
       |$roundCtes""".stripMargin
  }

  private[graft] lazy val lpaSql: String = {
    val rounds = 4
    s"""WITH ${lpaCtes(rounds)},
       |dg AS (SELECT u AS node, COUNT(*) AS deg FROM dd GROUP BY 1),
       |mem AS (SELECT l$rounds.lab, COUNT(*) AS n_nodes,
       |          SUM(CAST(dg.deg AS HUGEINT)) AS dsum
       |        FROM l$rounds JOIN dg USING (node) GROUP BY 1),
       |intra AS (SELECT lu.lab, COUNT(*) AS ec
       |          FROM prx JOIN l$rounds lu ON prx.u = lu.node
       |               JOIN l$rounds lv ON prx.v = lv.node
       |          WHERE lu.lab = lv.lab GROUP BY 1),
       |mm AS (SELECT COUNT(*) AS m FROM prx),
       |comm AS (SELECT mem.lab, mem.n_nodes, mem.dsum,
       |           COALESCE(intra.ec, 0) AS ec
       |         FROM mem LEFT JOIN intra USING (lab)),
       |qn AS (SELECT SUM(CAST(4 AS HUGEINT) * mm.m * ec - dsum * dsum)
       |           AS qnum,
       |         COUNT(*) AS n_communities
       |       FROM comm CROSS JOIN mm),
       |chg AS (SELECT SUM(CASE WHEN l$rounds.lab <> l${rounds - 1}.lab
       |             THEN 1 ELSE 0 END) AS n_changed_last
       |        FROM l$rounds JOIN l${rounds - 1} USING (node))
       |SELECT CAST(comm.lab AS BIGINT) AS community,
       |       CAST(n_nodes AS BIGINT) AS n_nodes,
       |       CAST(ec AS BIGINT) AS intra_edges,
       |       CAST(dsum AS BIGINT) AS deg_sum,
       |       CAST(n_communities AS BIGINT) AS n_communities,
       |       CAST(CASE WHEN mm.m = 0 THEN 0 ELSE
       |           round(CAST(qnum AS DOUBLE)
       |             / (4.0 * mm.m * mm.m) * 1e6, 0) END AS BIGINT)
       |         AS modularity_e6,
       |       CAST(COALESCE(n_changed_last, 0) AS BIGINT)
       |         AS n_changed_last
       |FROM comm CROSS JOIN mm CROSS JOIN qn CROSS JOIN chg
       |ORDER BY n_nodes DESC, community
       |LIMIT 20""".stripMargin
  }

  /** q264 HITS oracle (generated): 3 hub/authority rounds unrolled as
    * CTEs — each round sums the opposite side's previous scores over
    * the bipartite purchase edges and rescales by ⌊·10⁶ / max⌋ in
    * HUGEINT, matching the operator's ∞-norm integer contract. */
  private[graft] lazy val hitsSql: String = {
    val rounds = 3
    val roundCtes = (1 to rounds).map { t =>
      s"""h${t}r AS (SELECT c, SUM(a) AS h FROM ed JOIN a${t - 1} USING (p)
         |        GROUP BY c),
         |h${t}m AS (SELECT MAX(h) AS mx FROM h${t}r),
         |h$t AS (SELECT c, h * 1000000 // mx AS h
         |       FROM h${t}r CROSS JOIN h${t}m),
         |a${t}r AS (SELECT p, SUM(h) AS a FROM ed JOIN h$t USING (c)
         |        GROUP BY p),
         |a${t}m AS (SELECT MAX(a) AS mx FROM a${t}r),
         |a$t AS (SELECT p, a * 1000000 // mx AS a
         |       FROM a${t}r CROSS JOIN a${t}m)""".stripMargin
    }.mkString(",\n")
    s"""WITH ed AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
       |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |a0 AS (SELECT DISTINCT p, CAST(1000000 AS HUGEINT) AS a FROM ed),
       |$roundCtes,
       |hd AS (SELECT c, COUNT(*) AS deg FROM ed GROUP BY c),
       |ad AS (SELECT p, COUNT(*) AS deg FROM ed GROUP BY p),
       |un AS (SELECT 'hub' AS side, c AS node, hd.deg AS deg,
       |         h$rounds.h AS score
       |       FROM h$rounds JOIN hd USING (c)
       |       UNION ALL
       |       SELECT 'auth', p, ad.deg, a$rounds.a
       |       FROM a$rounds JOIN ad USING (p)),
       |rk AS (SELECT side, node, deg, score,
       |         row_number() OVER (PARTITION BY side
       |           ORDER BY score DESC, node) AS rk
       |       FROM un)
       |SELECT side, CAST(node AS BIGINT) AS node,
       |       CAST(deg AS BIGINT) AS degree,
       |       CAST(score AS BIGINT) AS score_e6
       |FROM rk WHERE rk <= 10
       |ORDER BY side, score_e6 DESC, node""".stripMargin
  }

  /** q279 conductance oracle: the shared q263 label loop, then per
    * community the cut (crossing edges counted at BOTH endpoints), the
    * degree volume, and φ = cut / min(vol, 2m − vol) in floor ppm. */
  private[graft] lazy val conductanceSql: String =
    s"""WITH ${lpaCtes(4)},
       |dg AS (SELECT u AS node, COUNT(*) AS deg FROM dd GROUP BY 1),
       |mem AS (SELECT l4.lab, COUNT(*) AS n_nodes,
       |          SUM(CAST(dg.deg AS HUGEINT)) AS vol
       |        FROM l4 JOIN dg USING (node) GROUP BY 1),
       |xe AS (SELECT lu.lab AS la, lv.lab AS lb
       |       FROM prx JOIN l4 lu ON prx.u = lu.node
       |       JOIN l4 lv ON prx.v = lv.node
       |       WHERE lu.lab <> lv.lab),
       |ct AS (SELECT lab, COUNT(*) AS cut FROM (
       |         SELECT la AS lab FROM xe
       |         UNION ALL SELECT lb FROM xe) z GROUP BY lab),
       |vt AS (SELECT COUNT(*) AS vol_total FROM dd)
       |SELECT mem.lab AS community, CAST(n_nodes AS BIGINT) AS n_nodes,
       |       CAST(vol AS BIGINT) AS volume,
       |       CAST(COALESCE(cut, 0) AS BIGINT) AS cut_edges,
       |       CAST(CASE WHEN LEAST(vol, CAST(vol_total AS HUGEINT) - vol)
       |              = 0 THEN 0
       |            ELSE CAST(COALESCE(cut, 0) AS HUGEINT) * 1000000
       |              // LEAST(vol, CAST(vol_total AS HUGEINT) - vol) END
       |         AS BIGINT) AS conductance_ppm
       |FROM mem LEFT JOIN ct ON ct.lab = mem.lab CROSS JOIN vt
       |ORDER BY n_nodes DESC, community
       |LIMIT 20""".stripMargin

  /** q274 sampled-betweenness oracle (generated): Brandes' two passes
    * UNROLLED — 6 forward BFS/path-count layers (anti-joined against
    * the accumulated visited set) then 6 backward dependency layers,
    * every layer MATERIALIZED (each is read by the next layer AND the
    * final rollup; inlining would nest the plan exponentially). All σ
    * sums HUGEINT; each δ term is the all-positive floor division
    * ⌊σv·(10⁶+δw)/σw⌋, mirroring the Spark DECIMAL(38,0) contract. */
  private[graft] lazy val betweennessSql: String = {
    val depth = 6
    val fwd = (1 to depth).map { t =>
      s"""ex$t AS (SELECT f.src, dd.v AS node, SUM(f.sigma) AS sigma
         |        FROM l${t - 1} f JOIN dd ON dd.u = f.node GROUP BY 1, 2),
         |l$t AS MATERIALIZED (SELECT e.src, e.node, e.sigma
         |      FROM ex$t e LEFT JOIN vis${t - 1} s
         |        ON s.src = e.src AND s.node = e.node
         |      WHERE s.node IS NULL),
         |vis$t AS MATERIALIZED (SELECT * FROM vis${t - 1}
         |       UNION ALL SELECT src, node FROM l$t)""".stripMargin
    }.mkString(",\n")
    val bwd = ((depth - 1) to 0 by -1).map { t =>
      s"""c$t AS (SELECT cur.src, cur.node,
         |        SUM((cur.sigma * (1000000 + dn.delta)) // dn.sigma) AS dsum
         |      FROM l$t cur JOIN dd ON dd.u = cur.node
         |      JOIN d${t + 1} dn ON dn.src = cur.src AND dn.node = dd.v
         |      GROUP BY 1, 2),
         |d$t AS MATERIALIZED (SELECT cur.src, cur.node, cur.sigma,
         |      CAST(COALESCE(c$t.dsum, 0) AS HUGEINT) AS delta
         |      FROM l$t cur LEFT JOIN c$t
         |        ON c$t.src = cur.src AND c$t.node = cur.node)""".stripMargin
    }.mkString(",\n")
    val allLayers = (0 to depth)
      .map(t => s"SELECT src, node, delta FROM d$t")
      .mkString("\n       UNION ALL ")
    s"""WITH it AS (SELECT DISTINCT l_orderkey AS oid, l_partkey AS item
       |            FROM lineitem),
       |prx AS (SELECT a.item AS u, b.item AS v
       |        FROM it a JOIN it b ON a.oid = b.oid AND a.item < b.item
       |        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |dd AS (SELECT u, v FROM prx UNION ALL SELECT v, u FROM prx),
       |srcs AS (SELECT DISTINCT u AS src FROM dd ORDER BY src LIMIT 4),
       |l0 AS MATERIALIZED (SELECT src, src AS node,
       |      CAST(1 AS HUGEINT) AS sigma FROM srcs),
       |vis0 AS (SELECT src, node FROM l0),
       |$fwd,
       |d$depth AS MATERIALIZED (SELECT src, node, sigma,
       |      CAST(0 AS HUGEINT) AS delta FROM l$depth),
       |$bwd,
       |alls AS ($allLayers),
       |bc AS (SELECT node, SUM(delta) AS ds, COUNT(*) AS nr
       |       FROM alls WHERE node <> src GROUP BY node),
       |nn AS (SELECT COUNT(DISTINCT u) AS n_nodes FROM dd),
       |ns AS (SELECT COUNT(*) AS n_src FROM srcs)
       |SELECT CAST(node AS BIGINT) AS node,
       |       CAST(nr AS BIGINT) AS n_sources_reaching,
       |       CAST(ds AS BIGINT) AS delta_sum_e6,
       |       CAST(ds * n_nodes // (2 * n_src) AS BIGINT) AS bc_est_e6
       |FROM bc CROSS JOIN nn CROSS JOIN ns
       |ORDER BY delta_sum_e6 DESC, node LIMIT 20""".stripMargin
  }

  /** q262 IVF probe sweep oracle (generated): the q49 centroid-probe
    * chain at k = 5 for nprobe ∈ {1, 2, 4}, each setting's hits counted
    * against the brute top-5. */
  private[graft] lazy val ivfSweepSql: String = {
    val probes = Seq(1, 2, 4)
    val per = probes.map { p =>
      s"""pb$p AS (SELECT query_id, cell FROM pr WHERE prk <= $p),
         |sc$p AS (SELECT p2.query_id, c.vec_id AS neighbor_id,
         |          ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) AS score
         |        FROM pb$p p2
         |        JOIN nm c ON c.label = p2.cell
         |        JOIN nm q ON q.vec_id = p2.query_id
         |        WHERE c.vec_id <> p2.query_id),
         |rk$p AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
         |    FROM sc$p) z WHERE rnk <= 5),
         |h$p AS (SELECT COUNT(*) AS n_hits
         |        FROM rk$p JOIN bx USING (query_id, neighbor_id))""".stripMargin
    }.mkString(",\n")
    val rows = probes.map(p =>
      s"""SELECT CAST($p AS INT) AS nprobe,
         |  (SELECT n_queries FROM nq) AS n_queries,
         |  (SELECT n_hits FROM h$p) AS n_hits""".stripMargin)
      .mkString("\nUNION ALL\n")
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
       |q AS (SELECT vec_id, emb, nrm FROM nm WHERE vec_id < 10),
       |nq AS (SELECT COUNT(*) AS n_queries FROM q),
       |pr AS (SELECT q.vec_id AS query_id, cn.cell,
       |              row_number() OVER (PARTITION BY q.vec_id
       |                ORDER BY ROUND(list_dot_product(q.emb, cn.centroid)/(q.nrm*cn.cnrm), 4) DESC,
       |                         cn.cell) AS prk
       |       FROM q CROSS JOIN cn),
       |bx AS (SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |           ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) AS score,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY ROUND(list_dot_product(q.emb, c.emb)/(q.nrm*c.nrm), 4) DESC,
       |                      c.vec_id) AS rnk
       |    FROM nm c CROSS JOIN q WHERE c.vec_id <> q.vec_id) z
       |  WHERE rnk <= 5),
       |$per
       |SELECT nprobe, CAST(n_queries AS BIGINT) AS n_queries,
       |       CAST(n_hits AS BIGINT) AS n_hits,
       |       CAST(n_hits * 1000000 // (n_queries * 5) AS BIGINT) AS recall_ppm
       |FROM ($rows) u ORDER BY nprobe""".stripMargin
  }

  /** q227 product-quantization oracle: deterministic seed-slice
    * codebook + one Lloyd refinement, integer coding/LUT/ADC joins —
    * extracted to a val so q246's retrieval-eval oracle can nest it
    * verbatim. Mirrors graft.ext.Similarity.pqTopK. */
  private[graft] lazy val pqTopKSql: String =
    s"""WITH $embCte,
       |ux AS (SELECT vec_id, unnest(emb) AS x,
       |              unnest(range(0, len(emb))) AS i, nrm FROM nm),
       |u6 AS (SELECT vec_id, CAST(i // 2 AS INT) AS m,
       |         CAST(i % 2 AS INT) AS j,
       |         CASE WHEN nrm = 0.0 THEN 0
       |              ELSE CAST(round(x / nrm * 1000000, 0) AS BIGINT)
       |         END AS xe6
       |       FROM ux),
       |b0 AS (SELECT CAST(vec_id AS INT) AS aid, m, j, xe6 AS ce6
       |       FROM u6 WHERE vec_id < 64),
       |d1 AS (SELECT u6.vec_id AS nid, u6.m, b0.aid,
       |         CAST(SUM((u6.xe6 - b0.ce6)*(u6.xe6 - b0.ce6))
       |           AS BIGINT) AS d2
       |       FROM u6 JOIN b0 ON u6.m = b0.m AND u6.j = b0.j
       |       GROUP BY 1, 2, 3),
       |a1 AS (SELECT nid, m, aid FROM (
       |    SELECT nid, m, aid, row_number() OVER (
       |      PARTITION BY nid, m ORDER BY d2, aid) AS rn
       |    FROM d1) z WHERE rn = 1),
       |book AS (SELECT a1.aid, a1.m, u6.j,
       |           CAST(CASE WHEN SUM(u6.xe6) >= 0
       |                THEN SUM(u6.xe6) // COUNT(*)
       |                ELSE -((-SUM(u6.xe6)) // COUNT(*)) END
       |             AS BIGINT) AS ce6
       |         FROM a1 JOIN u6 ON a1.nid = u6.vec_id AND a1.m = u6.m
       |         GROUP BY 1, 2, 3),
       |dist AS (SELECT u6.vec_id AS neighbor_id, u6.m, book.aid,
       |           CAST(SUM((u6.xe6 - book.ce6)*(u6.xe6 - book.ce6))
       |             AS BIGINT) AS d2
       |         FROM u6 JOIN book ON u6.m = book.m AND u6.j = book.j
       |         GROUP BY 1, 2, 3),
       |codes AS (SELECT neighbor_id, m, aid FROM (
       |    SELECT neighbor_id, m, aid, row_number() OVER (
       |      PARTITION BY neighbor_id, m ORDER BY d2, aid) AS rn
       |    FROM dist) z WHERE rn = 1),
       |lut AS (SELECT u6.vec_id AS query_id, u6.m, book.aid,
       |          CAST(SUM(u6.xe6 * book.ce6) AS BIGINT) AS pdot
       |        FROM u6 JOIN book ON u6.m = book.m AND u6.j = book.j
       |        WHERE u6.vec_id < 10
       |        GROUP BY 1, 2, 3),
       |sc AS (SELECT lut.query_id, codes.neighbor_id,
       |         CAST(SUM(lut.pdot) AS BIGINT) AS pq_dot
       |       FROM codes JOIN lut
       |         ON codes.m = lut.m AND codes.aid = lut.aid
       |       WHERE codes.neighbor_id <> lut.query_id
       |       GROUP BY 1, 2),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY pq_dot DESC, neighbor_id) AS rnk FROM sc),
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
       |       rk.pq_dot,
       |       CAST(CASE WHEN erk.neighbor_id IS NULL THEN 0 ELSE 1 END
       |         AS INT) AS in_exact_topk
       |FROM rk LEFT JOIN (SELECT * FROM erk WHERE rnk <= 5) erk
       |  ON rk.query_id = erk.query_id AND rk.neighbor_id = erk.neighbor_id
       |WHERE rk.rnk <= 5
       |ORDER BY rk.query_id, rank""".stripMargin

  /** q233 IVFADC oracle: the IVF centroid probe restricting the q227
    * ADC scoring to 2 cells; extracted to a val for q246's nesting.
    * Mirrors graft.ext.Similarity.ivfPqTopK. */
  private[graft] lazy val ivfAdcSql: String =
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
       |qq AS (SELECT vec_id, emb, nrm FROM nm WHERE vec_id < 10),
       |pr AS (SELECT q.vec_id AS query_id, cn.cell,
       |              row_number() OVER (PARTITION BY q.vec_id
       |                ORDER BY ROUND(list_dot_product(q.emb, cn.centroid)/(q.nrm*cn.cnrm), 4) DESC,
       |                         cn.cell) AS prk
       |       FROM qq q CROSS JOIN cn),
       |probed AS (SELECT query_id, cell FROM pr WHERE prk <= 2),
       |ux AS (SELECT vec_id, unnest(emb) AS x,
       |              unnest(range(0, len(emb))) AS i, nrm FROM nm),
       |u6 AS (SELECT vec_id, CAST(i // 2 AS INT) AS m,
       |         CAST(i % 2 AS INT) AS j,
       |         CASE WHEN nrm = 0.0 THEN 0
       |              ELSE CAST(round(x / nrm * 1000000, 0) AS BIGINT)
       |         END AS xe6
       |       FROM ux),
       |b0 AS (SELECT CAST(vec_id AS INT) AS aid, m, j, xe6 AS ce6
       |       FROM u6 WHERE vec_id < 64),
       |d1 AS (SELECT u6.vec_id AS nid, u6.m, b0.aid,
       |         CAST(SUM((u6.xe6 - b0.ce6)*(u6.xe6 - b0.ce6))
       |           AS BIGINT) AS d2
       |       FROM u6 JOIN b0 ON u6.m = b0.m AND u6.j = b0.j
       |       GROUP BY 1, 2, 3),
       |a1 AS (SELECT nid, m, aid FROM (
       |    SELECT nid, m, aid, row_number() OVER (
       |      PARTITION BY nid, m ORDER BY d2, aid) AS rn
       |    FROM d1) z WHERE rn = 1),
       |book AS (SELECT a1.aid, a1.m, u6.j,
       |           CAST(CASE WHEN SUM(u6.xe6) >= 0
       |                THEN SUM(u6.xe6) // COUNT(*)
       |                ELSE -((-SUM(u6.xe6)) // COUNT(*)) END
       |             AS BIGINT) AS ce6
       |         FROM a1 JOIN u6 ON a1.nid = u6.vec_id AND a1.m = u6.m
       |         GROUP BY 1, 2, 3),
       |dist AS (SELECT u6.vec_id AS neighbor_id, u6.m, book.aid,
       |           CAST(SUM((u6.xe6 - book.ce6)*(u6.xe6 - book.ce6))
       |             AS BIGINT) AS d2
       |         FROM u6 JOIN book ON u6.m = book.m AND u6.j = book.j
       |         GROUP BY 1, 2, 3),
       |codes AS (SELECT neighbor_id, m, aid FROM (
       |    SELECT neighbor_id, m, aid, row_number() OVER (
       |      PARTITION BY neighbor_id, m ORDER BY d2, aid) AS rn
       |    FROM dist) z WHERE rn = 1),
       |lut AS (SELECT u6.vec_id AS query_id, u6.m, book.aid,
       |          CAST(SUM(u6.xe6 * book.ce6) AS BIGINT) AS pdot
       |        FROM u6 JOIN book ON u6.m = book.m AND u6.j = book.j
       |        WHERE u6.vec_id < 10
       |        GROUP BY 1, 2, 3),
       |cand AS (SELECT p.query_id, c.vec_id AS neighbor_id, c.label AS cell
       |         FROM probed p JOIN nm c ON c.label = p.cell
       |         WHERE c.vec_id <> p.query_id),
       |sc AS (SELECT cand.query_id, cand.neighbor_id, cand.cell,
       |         CAST(SUM(lut.pdot) AS BIGINT) AS pq_dot
       |       FROM cand JOIN codes ON codes.neighbor_id = cand.neighbor_id
       |            JOIN lut ON lut.query_id = cand.query_id
       |                    AND lut.m = codes.m AND lut.aid = codes.aid
       |       GROUP BY 1, 2, 3),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY pq_dot DESC, neighbor_id) AS rnk FROM sc),
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
       |       rk.cell, rk.pq_dot,
       |       CAST(CASE WHEN erk.neighbor_id IS NULL THEN 0 ELSE 1 END
       |         AS INT) AS in_exact_topk
       |FROM rk LEFT JOIN (SELECT * FROM erk WHERE rnk <= 5) erk
       |  ON rk.query_id = erk.query_id AND rk.neighbor_id = erk.neighbor_id
       |WHERE rk.rnk <= 5
       |ORDER BY rk.query_id, rank""".stripMargin

  /** q292 IVFADC with residual encoding: q233's probe and candidate
    * restriction verbatim, but PQ codes quantize x − c(cell) against
    * integer (sign-split floor-mean) cell centroids, the LUT is
    * per-(query, probed cell) over query residuals, and scores add the
    * exact q·c(cell) offset term. Mirrors
    * graft.ext.Similarity.ivfAdcResidualTopK. */
  private[graft] lazy val ivfAdcResidualSql: String =
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
       |qq AS (SELECT vec_id, emb, nrm FROM nm WHERE vec_id < 10),
       |pr AS (SELECT q.vec_id AS query_id, cn.cell,
       |              row_number() OVER (PARTITION BY q.vec_id
       |                ORDER BY ROUND(list_dot_product(q.emb, cn.centroid)/(q.nrm*cn.cnrm), 4) DESC,
       |                         cn.cell) AS prk
       |       FROM qq q CROSS JOIN cn),
       |probed AS (SELECT query_id, cell FROM pr WHERE prk <= 2),
       |ux AS (SELECT vec_id, label, unnest(emb) AS x,
       |              unnest(range(0, len(emb))) AS i, nrm FROM nm),
       |u6 AS (SELECT vec_id, label AS cell, CAST(i // 2 AS INT) AS m,
       |         CAST(i % 2 AS INT) AS j,
       |         CASE WHEN nrm = 0.0 THEN 0
       |              ELSE CAST(round(x / nrm * 1000000, 0) AS BIGINT)
       |         END AS xe6
       |       FROM ux),
       |k6 AS (SELECT cell, m, j,
       |         CAST(CASE WHEN SUM(xe6) >= 0
       |              THEN SUM(xe6) // COUNT(*)
       |              ELSE -((-SUM(xe6)) // COUNT(*)) END AS BIGINT) AS ke6
       |       FROM u6 GROUP BY cell, m, j),
       |r6 AS (SELECT u6.vec_id, u6.m, u6.j, u6.xe6 - k6.ke6 AS re6
       |       FROM u6 JOIN k6 ON u6.cell = k6.cell AND u6.m = k6.m
       |                      AND u6.j = k6.j),
       |b0 AS (SELECT CAST(vec_id AS INT) AS aid, m, j, re6 AS ce6
       |       FROM r6 WHERE vec_id < 64),
       |d1 AS (SELECT r6.vec_id AS nid, r6.m, b0.aid,
       |         CAST(SUM((r6.re6 - b0.ce6)*(r6.re6 - b0.ce6))
       |           AS BIGINT) AS d2
       |       FROM r6 JOIN b0 ON r6.m = b0.m AND r6.j = b0.j
       |       GROUP BY 1, 2, 3),
       |a1 AS (SELECT nid, m, aid FROM (
       |    SELECT nid, m, aid, row_number() OVER (
       |      PARTITION BY nid, m ORDER BY d2, aid) AS rn
       |    FROM d1) z WHERE rn = 1),
       |book AS (SELECT a1.aid, a1.m, r6.j,
       |           CAST(CASE WHEN SUM(r6.re6) >= 0
       |                THEN SUM(r6.re6) // COUNT(*)
       |                ELSE -((-SUM(r6.re6)) // COUNT(*)) END
       |             AS BIGINT) AS ce6
       |         FROM a1 JOIN r6 ON a1.nid = r6.vec_id AND a1.m = r6.m
       |         GROUP BY 1, 2, 3),
       |dist AS (SELECT r6.vec_id AS neighbor_id, r6.m, book.aid,
       |           CAST(SUM((r6.re6 - book.ce6)*(r6.re6 - book.ce6))
       |             AS BIGINT) AS d2
       |         FROM r6 JOIN book ON r6.m = book.m AND r6.j = book.j
       |         GROUP BY 1, 2, 3),
       |codes AS (SELECT neighbor_id, m, aid FROM (
       |    SELECT neighbor_id, m, aid, row_number() OVER (
       |      PARTITION BY neighbor_id, m ORDER BY d2, aid) AS rn
       |    FROM dist) z WHERE rn = 1),
       |qc AS (SELECT u6.vec_id AS query_id, p.cell, u6.m, u6.j,
       |              u6.xe6, k6.ke6
       |       FROM u6 JOIN probed p ON p.query_id = u6.vec_id
       |       JOIN k6 ON k6.cell = p.cell AND k6.m = u6.m AND k6.j = u6.j),
       |lut AS (SELECT qc.query_id, qc.cell, qc.m, book.aid,
       |          CAST(SUM((qc.xe6 - qc.ke6) * book.ce6) AS BIGINT) AS pdot
       |        FROM qc JOIN book ON book.m = qc.m AND book.j = qc.j
       |        GROUP BY 1, 2, 3, 4),
       |off AS (SELECT query_id, cell, CAST(SUM(xe6 * ke6) AS BIGINT) AS cdot
       |        FROM qc GROUP BY 1, 2),
       |cand AS (SELECT p.query_id, c.vec_id AS neighbor_id, c.label AS cell
       |         FROM probed p JOIN nm c ON c.label = p.cell
       |         WHERE c.vec_id <> p.query_id),
       |sc AS (SELECT cand.query_id, cand.neighbor_id, cand.cell,
       |         CAST(SUM(lut.pdot) AS BIGINT) AS rdot
       |       FROM cand JOIN codes ON codes.neighbor_id = cand.neighbor_id
       |            JOIN lut ON lut.query_id = cand.query_id
       |                    AND lut.cell = cand.cell
       |                    AND lut.m = codes.m AND lut.aid = codes.aid
       |       GROUP BY 1, 2, 3),
       |sc2 AS (SELECT sc.query_id, sc.neighbor_id, sc.cell,
       |          sc.rdot + off.cdot AS adc_dot
       |        FROM sc JOIN off ON off.query_id = sc.query_id
       |                        AND off.cell = sc.cell),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY adc_dot DESC, neighbor_id) AS rnk FROM sc2),
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
       |       rk.cell, CAST(rk.adc_dot AS BIGINT) AS adc_dot,
       |       CAST(CASE WHEN erk.neighbor_id IS NULL THEN 0 ELSE 1 END
       |         AS INT) AS in_exact_topk
       |FROM rk LEFT JOIN (SELECT * FROM erk WHERE rnk <= 5) erk
       |  ON rk.query_id = erk.query_id AND rk.neighbor_id = erk.neighbor_id
       |WHERE rk.rnk <= 5
       |ORDER BY rk.query_id, rank""".stripMargin

  /** q236 multi-round k-means: 4 unrolled Lloyd rounds (generated) in
    * the q227 integer contract — e6 unit components, sign-split
    * floor-mean recentering, exact-integer argmin reassignment; the
    * `converged` flag compares the last two rounds' assignments.
    * Mirrors graft.ext.Similarity.kmeansRounds exactly. */
  /** The k-means CTE prefix through the round-`rounds` assignment
    * `a<rounds>` — shared by the q236 report and q247's cluster-eval
    * oracle (both consume the same unrolled Lloyd recursion). */
  private[graft] def kmeansAssignCtes(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""c$r AS (SELECT a.cell, u.i,
         |          CAST(CASE WHEN SUM(u.xe6) >= 0
         |               THEN SUM(u.xe6) // COUNT(*)
         |               ELSE -((-SUM(u.xe6)) // COUNT(*)) END AS BIGINT) AS ce6
         |        FROM a${r - 1} a JOIN ku6 u ON a.vec_id = u.vec_id
         |        GROUP BY 1, 2),
         |d$r AS (SELECT u.vec_id, c.cell,
         |          CAST(SUM((u.xe6 - c.ce6)*(u.xe6 - c.ce6)) AS BIGINT) AS d2
         |        FROM ku6 u JOIN c$r c ON u.i = c.i GROUP BY 1, 2),
         |a$r AS (SELECT vec_id, cell, d2 FROM (
         |    SELECT vec_id, cell, d2, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM d$r) z
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""$embCte,
       |kux AS (SELECT vec_id, label, unnest(emb) AS x,
       |          unnest(range(0, len(emb))) AS i, nrm FROM nm),
       |ku6 AS (SELECT vec_id, label, CAST(i AS INT) AS i,
       |          CAST(round(x / nrm * 1000000, 0) AS BIGINT) AS xe6
       |        FROM kux WHERE nrm > 0),
       |a0 AS (SELECT DISTINCT vec_id, label AS cell FROM ku6),
       |$roundCtes""".stripMargin
  }

  private[graft] lazy val kmeansRoundsSql: String = {
    val rounds = 4
    s"""WITH ${kmeansAssignCtes(rounds)},
       |mv AS (SELECT CAST(SUM(CASE WHEN p.cell <> a.cell THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_moved
       |       FROM a${rounds - 1} p JOIN a$rounds a USING (vec_id))
       |SELECT a.cell AS cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
       |       CAST(SUM(CASE WHEN p.cell <> a.cell THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_arrived,
       |       CAST(SUM(a.d2) AS BIGINT) AS total_d2,
       |       CAST(CASE WHEN mv.n_moved = 0 THEN 1 ELSE 0 END AS INT)
       |         AS converged
       |FROM a$rounds a JOIN a${rounds - 1} p USING (vec_id) CROSS JOIN mv
       |GROUP BY a.cell, mv.n_moved
       |ORDER BY cluster""".stripMargin
  }

  /** q239 label spreading: 3 unrolled frontier rounds (generated) over
    * the bucketed 0.30-cosine graph; assigned nodes are fixed, each
    * round is one edge⋈labels join + weighted argmax. Mirrors
    * SimilarityQueries.labelSpreading exactly. */
  private[graft] lazy val labelSpreadingSql: String = {
    val rounds = 3
    val roundCtes = (1 to rounds).map { r =>
      s"""n$r AS (SELECT e.u, l.label, CAST(SUM(e.w) AS BIGINT) AS s
         |       FROM ed e JOIN l${r - 1} l ON e.v = l.vec_id
         |       WHERE e.u NOT IN (SELECT vec_id FROM l${r - 1})
         |       GROUP BY 1, 2),
         |w$r AS (SELECT u, label FROM (
         |    SELECT u, label, row_number() OVER (PARTITION BY u
         |      ORDER BY s DESC, label) AS rn FROM n$r) z WHERE rn = 1),
         |l$r AS (SELECT * FROM l${r - 1}
         |        UNION ALL SELECT u, label, $r FROM w$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH $embCte,
       |bk AS (SELECT vec_id, emb, nrm,
       |    (CASE WHEN list_dot_product(emb, ${planeLit(0)}::DOUBLE[]) > 0 THEN 1 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeLit(1)}::DOUBLE[]) > 0 THEN 2 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeLit(2)}::DOUBLE[]) > 0 THEN 4 ELSE 0 END)
       |  + (CASE WHEN list_dot_product(emb, ${planeLit(3)}::DOUBLE[]) > 0 THEN 8 ELSE 0 END) AS bucket
       |  FROM nm),
       |pr0 AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
       |          ROUND(list_dot_product(a.emb, b.emb)/(a.nrm*b.nrm), 4) AS cos
       |        FROM bk a JOIN bk b
       |          ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |pw AS (SELECT ia, ib, CAST(round(cos*10000, 0) AS BIGINT) AS w
       |       FROM pr0 WHERE cos >= 0.30),
       |ed AS (SELECT ia AS u, ib AS v, w FROM pw
       |       UNION ALL SELECT ib, ia, w FROM pw),
       |l0 AS (SELECT vec_id, label, 0 AS ar FROM embeddings
       |       WHERE vec_id % 5 = 0),
       |$roundCtes
       |SELECT e.vec_id,
       |       CAST(CASE WHEN l.ar = 0 THEN 1 ELSE 0 END AS INT) AS is_seed,
       |       l.label, CAST(l.ar AS INT) AS assigned_round
       |FROM embeddings e LEFT JOIN l$rounds l USING (vec_id)
       |ORDER BY vec_id""".stripMargin
  }
}
