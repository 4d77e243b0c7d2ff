package graft.oracle

import graft.oracle.OracleDialect._

/** DuckDB oracle SQL — dedup tier
  * (20 queries). Values are verbatim from SparkEntry.scala
  * (round-11 mechanical split); SparkEntry.oracleSql concatenates the
  * domain maps, and QueriesSpec pins key-set equality (both directions) with the
  * query registry. */
object OracleDedup {
  private[graft] val sql: Map[String, String] = Map(
    "q17_dedup_by_key" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |        ORDER BY l_linenumber DESC, l_extendedprice DESC, l_partkey DESC,
        |                 l_suppkey DESC, l_quantity DESC, l_discount DESC,
        |                 l_tax DESC, l_shipdate DESC) AS rn
        |      FROM lineitem)
        |WHERE rn = 1
        |ORDER BY l_orderkey""".stripMargin,
    "q32_dedup_exact" ->
      s"""WITH $nCte
         |SELECT MIN(doc_id) AS rep_id, COUNT(*) AS n_copies, length(t) AS n_chars_norm
         |FROM n
         |GROUP BY t
         |ORDER BY rep_id""".stripMargin,
    "q33_dedup_ngram_jaccard" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |sh0 AS (SELECT DISTINCT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(sg)+1),
         |             i -> CAST(ord(substr(sg, i, 1)) AS BIGINT))),
         |           (h, c) -> (h * 31 + c) % ${graft.ext.TextOps.HashP}) AS sh
         |       FROM (SELECT doc_id, toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2] AS sg
         |             FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS g FROM tk) z) y),
         |hot AS (SELECT sh FROM sh0 GROUP BY sh
         |        HAVING COUNT(*) > ${graft.ext.TextDedup.DefaultMaxDf}),
         |sh AS (SELECT * FROM sh0 WHERE sh NOT IN (SELECT sh FROM hot)),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |iv AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
         |       FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |       ROUND(CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter), 4) AS jaccard
         |FROM iv JOIN sz za ON za.doc_id = iv.doc_a JOIN sz zb ON zb.doc_id = iv.doc_b
         |WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q34_dedup_minhash_lsh" ->
      s"""WITH $nCte,
         |$minhashCtes
         |SELECT doc_a, doc_b,
         |       ROUND(CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter), 4) AS jaccard
         |FROM iv JOIN sz za ON za.doc_id = iv.doc_a JOIN sz zb ON zb.doc_id = iv.doc_b
         |WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q35_dedup_simhash" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |bg AS (SELECT doc_id, toks[g] || ' ' || toks[g+1] AS f
         |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS g FROM tk) z),
         |th AS (SELECT doc_id, ${hv8("rpad(f, 8, ' ')")} AS hv FROM bg),
         |votes AS (SELECT doc_id, $simhashVoteCols FROM th GROUP BY doc_id),
         |fp AS (SELECT doc_id, CAST($simhashFpExpr AS BIGINT) AS fp FROM votes),
         |bnd AS (SELECT doc_id, fp, shift, (fp >> shift) & 255 AS bv
         |        FROM fp CROSS JOIN (VALUES (0),(8),(16),(24)) AS s(shift)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |                x.fp AS fp_a, y.fp AS fp_b
         |         FROM bnd x JOIN bnd y
         |           ON x.shift = y.shift AND x.bv = y.bv AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(fp_a, fp_b)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q47_dedup_clusters" ->
      s"""WITH RECURSIVE $nCte,
         |$minhashCtes,
         |pairs AS (SELECT doc_a, doc_b
         |          FROM iv JOIN sz za ON za.doc_id = iv.doc_a JOIN sz zb ON zb.doc_id = iv.doc_b
         |          WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.8),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |reach(node, label) AS (
         |  SELECT src AS node, src AS label FROM edges
         |  UNION
         |  SELECT e.dst AS node, r.label AS label FROM reach r JOIN edges e ON e.src = r.node)
         |SELECT node AS doc_id, MIN(label) AS cluster_id,
         |       CAST(CASE WHEN node = MIN(label) THEN 1 ELSE 0 END AS INT) AS is_rep
         |FROM reach
         |GROUP BY node
         |ORDER BY doc_id""".stripMargin,
    // Cluster-size histogram: the q47 reachability labels rolled into a
    // per-size report with keep-first (min doc_id) drop volumes; the
    // size-1 row is the singleton spine.
    "q289_cluster_sizes" ->
      s"""WITH RECURSIVE $nCte,
         |$minhashCtes,
         |pairs AS (SELECT doc_a, doc_b
         |          FROM iv JOIN sz za ON za.doc_id = iv.doc_a JOIN sz zb ON zb.doc_id = iv.doc_b
         |          WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.8),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |reach(node, label) AS (
         |  SELECT src AS node, src AS label FROM edges
         |  UNION
         |  SELECT e.dst AS node, r.label AS label FROM reach r JOIN edges e ON e.src = r.node),
         |mem AS (SELECT node AS doc_id, MIN(label) AS cluster_id
         |        FROM reach GROUP BY node),
         |tk AS (SELECT doc_id, CAST(len(string_split(t, ' ')) AS BIGINT)
         |         AS n_tokens FROM n),
         |per AS (SELECT m.cluster_id, COUNT(*) AS csz,
         |          CAST(SUM(tk.n_tokens) AS BIGINT) AS tt,
         |          arg_min(tk.n_tokens, m.doc_id) AS kt
         |        FROM mem m JOIN tk ON tk.doc_id = m.doc_id
         |        GROUP BY m.cluster_id),
         |hist AS (SELECT csz AS cluster_size, COUNT(*) AS n_clusters,
         |           CAST(SUM(csz) AS BIGINT) AS n_docs,
         |           CAST(SUM(csz - 1) AS BIGINT) AS n_dropped_docs,
         |           CAST(SUM(tt - kt) AS BIGINT) AS n_dropped_tokens
         |         FROM per GROUP BY csz),
         |na AS (SELECT COUNT(*) AS n_corpus FROM documents),
         |nc AS (SELECT COUNT(*) AS n_clustered FROM mem)
         |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
         |       CAST(n_clusters AS BIGINT) AS n_clusters, n_docs,
         |       n_dropped_docs, n_dropped_tokens
         |FROM hist
         |UNION ALL
         |SELECT 1, CAST(n_corpus - n_clustered AS BIGINT),
         |       CAST(n_corpus - n_clustered AS BIGINT),
         |       CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |FROM na CROSS JOIN nc
         |ORDER BY cluster_size""".stripMargin,
    // Keep-best dedup: the q47 reachability labels extended with a
    // longest-text survivor per cluster (ties to smallest doc_id).
    "q184_dedup_keep_best" ->
      s"""WITH RECURSIVE $nCte,
         |$minhashCtes,
         |pairs AS (SELECT doc_a, doc_b
         |          FROM iv JOIN sz za ON za.doc_id = iv.doc_a JOIN sz zb ON zb.doc_id = iv.doc_b
         |          WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.8),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |reach(node, label) AS (
         |  SELECT src AS node, src AS label FROM edges
         |  UNION
         |  SELECT e.dst AS node, r.label AS label FROM reach r JOIN edges e ON e.src = r.node),
         |mem AS (SELECT node AS doc_id, MIN(label) AS cluster_id
         |        FROM reach GROUP BY node),
         |ln AS (SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars FROM n),
         |j AS (SELECT m.cluster_id, m.doc_id, ln.n_chars
         |      FROM mem m JOIN ln ON m.doc_id = ln.doc_id),
         |r AS (SELECT cluster_id, doc_id, n_chars,
         |             row_number() OVER (PARTITION BY cluster_id
         |               ORDER BY n_chars DESC, doc_id) AS rk
         |      FROM j)
         |SELECT cluster_id,
         |       MIN(CASE WHEN rk = 1 THEN doc_id END) AS kept_doc,
         |       COUNT(*) AS n_members,
         |       MIN(CASE WHEN rk = 1 THEN n_chars END) AS kept_chars,
         |       CAST(SUM(n_chars) - MIN(CASE WHEN rk = 1 THEN n_chars END)
         |            AS BIGINT) AS dropped_chars
         |FROM r GROUP BY cluster_id
         |ORDER BY cluster_id""".stripMargin,
    // Span strings are rebuilt with list-slice + array_to_string — the
    // same characters (tokens joined by single spaces) the kernel hashes.
    "q61_dup_passages" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |pg AS (SELECT doc_id, array_to_string(toks[g:g+19], ' ') AS sg
         |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-18)) AS g FROM tk) z),
         |ph AS (SELECT DISTINCT doc_id, ${fullHash("sg")} AS hv FROM pg)
         |SELECT hv AS passage_hash, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
         |FROM ph GROUP BY hv
         |HAVING COUNT(*) >= 2
         |ORDER BY passage_hash""".stripMargin,
    "q58_decontamination" ->
      s"""WITH $nCte,
         |$char8HashCte,
         |bh AS (SELECT DISTINCT hv FROM h WHERE doc_id < 5),
         |sz AS (SELECT doc_id, COUNT(*) AS n_shingles FROM h
         |       WHERE doc_id >= 5 GROUP BY 1),
         |ov AS (SELECT doc_id, COUNT(*) AS n_contam FROM h
         |       WHERE doc_id >= 5 AND hv IN (SELECT hv FROM bh) GROUP BY 1)
         |SELECT sz.doc_id, sz.n_shingles,
         |       COALESCE(ov.n_contam, 0) AS n_contam,
         |       ROUND(CAST(COALESCE(ov.n_contam, 0) AS DOUBLE)/sz.n_shingles, 4)
         |         AS contam_frac,
         |       CASE WHEN ROUND(CAST(COALESCE(ov.n_contam, 0) AS DOUBLE)/sz.n_shingles, 4) >= 0.35
         |            THEN 1 ELSE 0 END AS flagged
         |FROM sz LEFT JOIN ov ON sz.doc_id = ov.doc_id
         |ORDER BY sz.doc_id""".stripMargin,
    // Mirrors Versioning.exactNewDocs: md5 content hash of the prev
    // snapshot (doc_id < 400), left-join marker probe over every doc.
    // md5(text) == rowHash(Seq("text")) because documents.text is
    // non-null in the corpus (same simplification as q65's oracle).
    "q68_exact_new_docs" ->
      """WITH ph AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 400)
        |SELECT d.doc_id,
        |       CASE WHEN ph.h IS NULL THEN 1 ELSE 0 END AS is_new
        |FROM (SELECT doc_id, md5(text) AS h FROM documents) d
        |LEFT JOIN ph ON d.h = ph.h
        |ORDER BY d.doc_id""".stripMargin,
    // The verified near-dup pairs of the q34 tier, joined to their
    // source labels and rolled up per unordered source pair.
    "q94_cross_source_leak" ->
      s"""WITH $nCte,
         |$minhashCtes,
         |p AS (SELECT doc_a, doc_b
         |      FROM iv JOIN sz za ON za.doc_id = iv.doc_a
         |              JOIN sz zb ON zb.doc_id = iv.doc_b
         |      WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.8),
         |x AS (SELECT LEAST(sa.source, sb.source) AS source_lo,
         |             GREATEST(sa.source, sb.source) AS source_hi,
         |             doc_a, doc_b
         |      FROM p JOIN documents sa ON sa.doc_id = p.doc_a
         |             JOIN documents sb ON sb.doc_id = p.doc_b
         |      WHERE sa.source <> sb.source),
         |y AS (SELECT *, row_number() OVER (PARTITION BY source_lo, source_hi
         |             ORDER BY doc_a, doc_b) AS rn
         |      FROM x)
         |SELECT source_lo, source_hi, COUNT(*) AS n_pairs,
         |       MAX(CASE WHEN rn = 1 THEN doc_a END) AS example_doc_a,
         |       MAX(CASE WHEN rn = 1 THEN doc_b END) AS example_doc_b
         |FROM y GROUP BY source_lo, source_hi
         |ORDER BY source_lo, source_hi""".stripMargin,
    // Same capped shingle space as q33; asymmetric |A∩B|/|A| instead of
    // Jaccard, pair kept when EITHER direction clears the threshold.
    // Ratios are fixed-point floor division (q90 idiom) — the exact
    // integer ratio can land on a rounding half-tie that ROUND splits
    // differently across engines.
    "q95_dedup_containment" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |sh0 AS (SELECT DISTINCT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(sg)+1),
         |             i -> CAST(ord(substr(sg, i, 1)) AS BIGINT))),
         |           (h, c) -> (h * 31 + c) % ${graft.ext.TextOps.HashP}) AS sh
         |       FROM (SELECT doc_id, toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2] AS sg
         |             FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS g FROM tk) z) y),
         |hot AS (SELECT sh FROM sh0 GROUP BY sh
         |        HAVING COUNT(*) > ${graft.ext.TextDedup.DefaultMaxDf}),
         |sh AS (SELECT * FROM sh0 WHERE sh NOT IN (SELECT sh FROM hot)),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |iv AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
         |       FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT doc_a, doc_b, za.n AS n_a, zb.n AS n_b, n_inter,
         |       CAST((n_inter * 10000) // za.n AS DOUBLE)/10000.0 AS contain_a,
         |       CAST((n_inter * 10000) // zb.n AS DOUBLE)/10000.0 AS contain_b
         |FROM iv JOIN sz za ON za.doc_id = iv.doc_a
         |        JOIN sz zb ON zb.doc_id = iv.doc_b
         |WHERE GREATEST(CAST(n_inter AS DOUBLE)/za.n,
         |               CAST(n_inter AS DOUBLE)/zb.n) >= 0.6
         |ORDER BY doc_a, doc_b""".stripMargin,
    // Same hashed word-3-gram space as q95 (NO df cap — novelty needs
    // the full df spectrum; the df join is 1:1 per (doc, shingle) row,
    // linear at any scale); novelty is fixed-point floor division.
    "q110_shingle_novelty" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |sh0 AS (SELECT DISTINCT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(sg)+1),
         |             i -> CAST(ord(substr(sg, i, 1)) AS BIGINT))),
         |           (h, c) -> (h * 31 + c) % ${graft.ext.TextOps.HashP}) AS sh
         |       FROM (SELECT doc_id, toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2] AS sg
         |             FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS g FROM tk) z) y),
         |df AS (SELECT sh, COUNT(*) AS df FROM sh0 GROUP BY sh)
         |SELECT s.doc_id, COUNT(*) AS n_shingles,
         |       CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |       CAST((CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |            // COUNT(*) AS DOUBLE)/1000000.0 AS novelty
         |FROM sh0 s JOIN df d ON s.sh = d.sh
         |GROUP BY s.doc_id
         |ORDER BY s.doc_id""".stripMargin,
    // Candidates are q34's band collisions verbatim; edit distance runs
    // on the printable-ASCII projection of the normalized text (DuckDB's
    // levenshtein counts bytes, Spark counts chars — ASCII makes them
    // agree); similarity is fixed-point floor division.
    "q119_fuzzy_pairs" ->
      s"""WITH $nCte,
         |$minhashCtes,
         |tt AS (SELECT doc_id, regexp_replace(t, '[^ -~]', '', 'g') AS ta FROM n),
         |pairs AS (
         |  SELECT c.doc_a, c.doc_b,
         |         CAST(levenshtein(x.ta, y.ta) AS INT) AS dist,
         |         GREATEST(length(x.ta), length(y.ta)) AS maxlen
         |  FROM cand c
         |  JOIN tt x ON x.doc_id = c.doc_a
         |  JOIN tt y ON y.doc_id = c.doc_b)
         |SELECT doc_a, doc_b, dist,
         |       CASE WHEN maxlen = 0 THEN 1.0
         |            ELSE CAST(((maxlen - dist) * 10000) // maxlen AS DOUBLE)/10000.0
         |       END AS similarity
         |FROM pairs
         |ORDER BY doc_a, doc_b""".stripMargin,
    // Incremental exact dedup: the oracle recomputes the merged
    // assignment from scratch (state = even ids, batch = odd), so the
    // engine's differential state-probe path must equal a full re-run.
    // Text equality stands in for the engine's xxhash64 group key (the
    // q32 contract).
    "q124_dedup_exact_incr" ->
      s"""WITH $nCte,
         |st AS (SELECT t, MIN(doc_id) AS rep_id FROM n
         |       WHERE doc_id % 2 = 0 GROUP BY t),
         |b AS (SELECT doc_id, t FROM n WHERE doc_id % 2 = 1),
         |newg AS (SELECT t, MIN(doc_id) AS rep_id FROM b
         |         WHERE NOT EXISTS (SELECT 1 FROM st WHERE st.t = b.t)
         |         GROUP BY t)
         |SELECT b.doc_id,
         |       COALESCE(st.rep_id, ng.rep_id) AS rep_id,
         |       CASE WHEN st.rep_id IS NULL AND b.doc_id = ng.rep_id
         |            THEN 1 ELSE 0 END AS is_new_group
         |FROM b LEFT JOIN st ON b.t = st.t
         |       LEFT JOIN newg ng ON b.t = ng.t
         |ORDER BY b.doc_id""".stripMargin,
    // Incremental MinHash+LSH: the engine signs only the odd-id batch
    // and probes the persisted even-id band/shingle state; the oracle is
    // the FULL-corpus q34 pair run restricted to pairs touching the
    // batch — differential semantics checked against a from-scratch run.
    "q125_dedup_minhash_incr" ->
      s"""WITH $nCte,
         |$minhashCtes
         |SELECT doc_a, doc_b,
         |       ROUND(CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter), 4) AS jaccard
         |FROM iv JOIN sz za ON za.doc_id = iv.doc_a JOIN sz zb ON zb.doc_id = iv.doc_b
         |WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.8
         |  AND (doc_a % 2 = 1 OR doc_b % 2 = 1)
         |ORDER BY doc_a, doc_b""".stripMargin,
    // Blocked sorted-neighborhood: the q35 SimHash fingerprint chain,
    // row-numbered inside each 8-bit fp block, candidates = rank gaps
    // 1..3 (window 4), verified by the q33 word-3-gram Jaccard over the
    // UNCAPPED shingle space restricted to candidate pairs.
    "q191_snm_dedup" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |bg AS (SELECT doc_id, toks[g] || ' ' || toks[g+1] AS f
         |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS g FROM tk) z),
         |th AS (SELECT doc_id, ${hv8("rpad(f, 8, ' ')")} AS hv FROM bg),
         |votes AS (SELECT doc_id, $simhashVoteCols FROM th GROUP BY doc_id),
         |fp AS (SELECT doc_id, CAST($simhashFpExpr AS BIGINT) AS fp FROM votes),
         |rk AS (SELECT doc_id, fp, row_number() OVER (PARTITION BY fp >> 24
         |         ORDER BY fp, doc_id) AS rn, fp >> 24 AS block FROM fp),
         |cand AS (SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
         |                greatest(x.doc_id, y.doc_id) AS doc_b
         |         FROM rk x JOIN rk y ON x.block = y.block
         |           AND y.rn > x.rn AND y.rn <= x.rn + 3),
         |sh AS (SELECT DISTINCT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT),
         |           list_transform(range(1, length(sg)+1),
         |             i -> CAST(ord(substr(sg, i, 1)) AS BIGINT))),
         |           (h, c) -> (h * 31 + c) % ${graft.ext.TextOps.HashP}) AS sh
         |       FROM (SELECT doc_id, toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2] AS sg
         |             FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS g FROM tk) z) y),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |iv AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
         |       FROM cand c
         |       JOIN sh a ON a.doc_id = c.doc_a
         |       JOIN sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
         |       GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |       ROUND(CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter), 4) AS jaccard
         |FROM iv JOIN sz za ON za.doc_id = iv.doc_a
         |        JOIN sz zb ON zb.doc_id = iv.doc_b
         |WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    // LSH candidate-tier eval: band-collision candidates (the q34 cand
    // CTE) vs df-capped exact char-8-gram Jaccard ground truth at
    // thresholds 0.5/0.8; P/R/F1 floor ppm, zero_division = 0.
    "q244_lsh_candidate_eval" ->
      s"""WITH $nCte,
         |$minhashCtes,
         |$exactJaccardCtes,
         |nc AS (SELECT COUNT(*) AS n_cand FROM cand),
         |ex5 AS (SELECT doc_a, doc_b FROM jp
         |        WHERE CAST(n_inter AS DOUBLE)/u >= 0.5),
         |ex8 AS (SELECT doc_a, doc_b FROM jp
         |        WHERE CAST(n_inter AS DOUBLE)/u >= 0.8),
         |f5 AS (SELECT CAST(500000 AS BIGINT) AS threshold_ppm,
         |         (SELECT COUNT(*) FROM ex5) AS n_exact,
         |         (SELECT n_cand FROM nc) AS n_cand,
         |         (SELECT COUNT(*) FROM ex5 JOIN cand USING (doc_a, doc_b))
         |           AS n_hit),
         |f8 AS (SELECT CAST(800000 AS BIGINT) AS threshold_ppm,
         |         (SELECT COUNT(*) FROM ex8) AS n_exact,
         |         (SELECT n_cand FROM nc) AS n_cand,
         |         (SELECT COUNT(*) FROM ex8 JOIN cand USING (doc_a, doc_b))
         |           AS n_hit),
         |fin AS (SELECT * FROM f5 UNION ALL SELECT * FROM f8),
         |mt AS (SELECT *,
         |         CASE WHEN n_cand = 0 THEN 0
         |              ELSE n_hit * 1000000 // n_cand END AS precision_ppm,
         |         CASE WHEN n_exact = 0 THEN 0
         |              ELSE n_hit * 1000000 // n_exact END AS recall_ppm
         |       FROM fin)
         |SELECT threshold_ppm, CAST(n_exact AS BIGINT) AS n_exact,
         |       CAST(n_cand AS BIGINT) AS n_cand,
         |       CAST(n_hit AS BIGINT) AS n_hit,
         |       CAST(precision_ppm AS BIGINT) AS precision_ppm,
         |       CAST(recall_ppm AS BIGINT) AS recall_ppm,
         |       CAST(CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
         |            ELSE 2*precision_ppm*recall_ppm
         |                 //(precision_ppm + recall_ppm) END AS BIGINT) AS f1_ppm
         |FROM mt ORDER BY threshold_ppm""".stripMargin,

    // Dedup threshold sweep: the exact char-8-gram pair tier filtered
    // at 4 thresholds; drop = doc_b of any >= t pair (keep-first rule);
    // token volumes from one doc-keyed projection.
    "q248_dedup_sweep" ->
      s"""WITH $nCte,
         |$char8HashCte,
         |$exactJaccardCtes,
         |tk AS (SELECT doc_id,
         |         CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens
         |       FROM n),
         |tot AS (SELECT COUNT(*) AS total_docs,
         |          CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM tk),
         |th AS (SELECT unnest([300000, 500000, 700000, 900000]) AS threshold_ppm),
         |pp AS (SELECT th.threshold_ppm, jp.doc_a, jp.doc_b
         |       FROM th JOIN jp
         |         ON CAST(jp.n_inter AS DOUBLE)/jp.u >= th.threshold_ppm/1e6),
         |np AS (SELECT threshold_ppm, COUNT(*) AS n_pairs
         |       FROM pp GROUP BY threshold_ppm),
         |dr AS (SELECT DISTINCT threshold_ppm, doc_b AS doc_id FROM pp),
         |ds AS (SELECT threshold_ppm, COUNT(*) AS n_dropped,
         |         CAST(SUM(n_tokens) AS BIGINT) AS dropped_tokens
         |       FROM dr JOIN tk USING (doc_id) GROUP BY threshold_ppm)
         |SELECT CAST(th.threshold_ppm AS BIGINT) AS threshold_ppm,
         |       CAST(COALESCE(np.n_pairs, 0) AS BIGINT) AS n_pairs,
         |       CAST(COALESCE(ds.n_dropped, 0) AS BIGINT) AS n_dropped,
         |       CAST(COALESCE(ds.dropped_tokens, 0) AS BIGINT) AS dropped_tokens,
         |       CAST(tot.total_docs - COALESCE(ds.n_dropped, 0) AS BIGINT)
         |         AS kept_docs,
         |       CAST(tot.total_tokens - COALESCE(ds.dropped_tokens, 0) AS BIGINT)
         |         AS kept_tokens
         |FROM th LEFT JOIN np USING (threshold_ppm)
         |     LEFT JOIN ds USING (threshold_ppm) CROSS JOIN tot
         |ORDER BY threshold_ppm""".stripMargin,

    // Gopher-style repeated-4-gram scrub accounting: per doc the union
    // of positions covered by second+ occurrences, per-source volumes.
    "q260_repeat_scrub" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |oc AS (SELECT doc_id, CAST(g - 1 AS BIGINT) AS pos,
         |         ${fullHash("(toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2] || ' ' || toks[g+3])")} AS h
         |       FROM (SELECT doc_id, toks,
         |               unnest(range(1, len(toks) - 2)) AS g FROM tk) z),
         |rp AS (SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos, row_number() OVER (
         |      PARTITION BY doc_id, h ORDER BY pos) AS rn FROM oc) z
         |  WHERE rn >= 2),
         |cv AS (SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS p FROM (
         |    SELECT doc_id, unnest(range(pos, pos + 4)) AS p FROM rp) z),
         |rm AS (SELECT doc_id, COUNT(*) AS n_removed FROM cv GROUP BY doc_id),
         |sz AS (SELECT d.doc_id, d.source,
         |         CAST(len(string_split(n.t, ' ')) AS BIGINT) AS n_tokens
         |       FROM documents d JOIN n USING (doc_id))
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN COALESCE(n_removed, 0) > 0 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_affected,
         |       CAST(SUM(n_tokens) AS BIGINT) AS tokens_before,
         |       CAST(SUM(n_tokens - COALESCE(n_removed, 0)) AS BIGINT)
         |         AS tokens_after,
         |       CAST(SUM(COALESCE(n_removed, 0)) * 1000000 // SUM(n_tokens)
         |         AS BIGINT) AS removed_ppm
         |FROM sz LEFT JOIN rm USING (doc_id)
         |GROUP BY source
         |ORDER BY source""".stripMargin,

    // Dedup tier agreement: exact/minhash/simhash drop-set Venn under
    // the shared keep-first rule (8-row combination rollup).
    "q278_dedup_tier_matrix" ->
      s"""WITH $nCte,
         |hx AS (SELECT doc_id, md5(t) AS hh FROM n),
         |kp AS (SELECT hh, MIN(doc_id) AS keeper FROM hx GROUP BY hh),
         |exd AS (SELECT DISTINCT hx.doc_id, 1 AS f_exact
         |        FROM hx JOIN kp USING (hh) WHERE doc_id > keeper),
         |$minhashCtes,
         |mhd AS (SELECT DISTINCT iv.doc_b AS doc_id, 1 AS f_minhash
         |        FROM iv JOIN sz za ON za.doc_id = iv.doc_a
         |        JOIN sz zb ON zb.doc_id = iv.doc_b
         |        WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.8),
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |s_bg AS (SELECT doc_id, toks[g] || ' ' || toks[g+1] AS f
         |         FROM (SELECT doc_id, toks,
         |                 unnest(range(1, len(toks))) AS g FROM tk) z),
         |s_th AS (SELECT doc_id, ${hv8("rpad(f, 8, ' ')")} AS hv FROM s_bg),
         |s_vt AS (SELECT doc_id, $simhashVoteCols FROM s_th GROUP BY doc_id),
         |s_fp AS (SELECT doc_id, CAST($simhashFpExpr AS BIGINT) AS fp
         |         FROM s_vt),
         |s_bd AS (SELECT doc_id, fp, shift, (fp >> shift) & 255 AS bv
         |         FROM s_fp CROSS JOIN (VALUES (0),(8),(16),(24)) AS s(shift)),
         |s_cd AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |                x.fp AS fp_a, y.fp AS fp_b
         |         FROM s_bd x JOIN s_bd y
         |           ON x.shift = y.shift AND x.bv = y.bv
         |              AND x.doc_id < y.doc_id),
         |shd AS (SELECT DISTINCT doc_b AS doc_id, 1 AS f_simhash
         |        FROM s_cd WHERE bit_count(xor(fp_a, fp_b)) <= 3),
         |ids AS (SELECT doc_id FROM documents)
         |SELECT CAST(COALESCE(f_exact, 0) AS INT) AS f_exact,
         |       CAST(COALESCE(f_minhash, 0) AS INT) AS f_minhash,
         |       CAST(COALESCE(f_simhash, 0) AS INT) AS f_simhash,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(MIN(doc_id) AS BIGINT) AS example_doc
         |FROM ids LEFT JOIN exd USING (doc_id)
         |     LEFT JOIN mhd USING (doc_id) LEFT JOIN shd USING (doc_id)
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,

    // CCNet line dedup: non-overlapping 4-token lines, scrub lines with
    // df >= 2 distinct docs; per-source volume accounting.
    "q266_line_dedup" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |ln AS (SELECT doc_id,
         |         ${fullHash("(toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2] || ' ' || toks[g+3])")} AS lh
         |       FROM (SELECT doc_id, toks,
         |               unnest(range(1, len(toks) - 2)) AS g FROM tk) z
         |       WHERE (g - 1) % 4 = 0),
         |bo AS (SELECT lh FROM (SELECT lh, COUNT(DISTINCT doc_id) AS df
         |                       FROM ln GROUP BY lh) z WHERE df >= 2),
         |rm AS (SELECT doc_id, COUNT(*) AS lines_removed
         |       FROM ln JOIN bo USING (lh) GROUP BY doc_id),
         |lc AS (SELECT doc_id, COUNT(*) AS n_lines FROM ln GROUP BY doc_id),
         |sz AS (SELECT d.doc_id, d.source,
         |         CAST(len(string_split(n.t, ' ')) AS BIGINT) AS n_tokens
         |       FROM documents d JOIN n USING (doc_id))
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN COALESCE(lines_removed, 0) > 0 THEN 1
         |                ELSE 0 END) AS BIGINT) AS n_affected,
         |       CAST(SUM(COALESCE(n_lines, 0)) AS BIGINT) AS lines_total,
         |       CAST(SUM(COALESCE(lines_removed, 0)) AS BIGINT) AS lines_removed,
         |       CAST(SUM(n_tokens) AS BIGINT) AS tokens_before,
         |       CAST(SUM(n_tokens - COALESCE(lines_removed, 0) * 4) AS BIGINT)
         |         AS tokens_after,
         |       CAST((SUM(n_tokens)
         |              - SUM(n_tokens - COALESCE(lines_removed, 0) * 4))
         |            * 1000000 // SUM(n_tokens) AS BIGINT) AS removed_ppm
         |FROM sz LEFT JOIN lc USING (doc_id) LEFT JOIN rm USING (doc_id)
         |GROUP BY source
         |ORDER BY source""".stripMargin,

    // Cross-doc span scrub: covered-position union per doc over the
    // LSH-verified (Jaccard >= 0.5) pair tier, word-4-gram spans.
    "q268_span_scrub_xdoc" ->
      s"""WITH $nCte,
         |$minhashCtes,
         |pr AS (SELECT doc_a, doc_b
         |       FROM iv JOIN sz za ON za.doc_id = iv.doc_a
         |       JOIN sz zb ON zb.doc_id = iv.doc_b
         |       WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.5),
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |oc AS (SELECT doc_id, CAST(g - 1 AS BIGINT) AS pos,
         |         ${fullHash("(toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2] || ' ' || toks[g+3])")} AS hh
         |       FROM (SELECT doc_id, toks,
         |               unnest(range(1, len(toks) - 2)) AS g FROM tk) z),
         |dh AS (SELECT DISTINCT doc_id, hh FROM oc),
         |dr AS (SELECT doc_a AS victim, doc_b AS partner FROM pr
         |       UNION ALL SELECT doc_b, doc_a FROM pr),
         |shr AS (SELECT DISTINCT o.doc_id, o.pos
         |        FROM dr JOIN oc o ON o.doc_id = dr.victim
         |        JOIN dh ON dh.doc_id = dr.partner AND dh.hh = o.hh),
         |cv AS (SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS p FROM (
         |         SELECT doc_id, unnest(range(pos, pos + 4)) AS p FROM shr) z),
         |rm AS (SELECT doc_id, COUNT(*) AS n_removed FROM cv GROUP BY doc_id),
         |ip AS (SELECT DISTINCT victim AS doc_id, 1 AS in_pairs FROM dr),
         |tb AS (SELECT d.doc_id, d.source,
         |         CAST(len(string_split(n.t, ' ')) AS BIGINT) AS n_tokens
         |       FROM documents d JOIN n USING (doc_id))
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(COALESCE(in_pairs, 0)) AS BIGINT) AS n_in_pairs,
         |       CAST(SUM(CASE WHEN COALESCE(n_removed, 0) > 0 THEN 1
         |                ELSE 0 END) AS BIGINT) AS n_affected,
         |       CAST(SUM(n_tokens) AS BIGINT) AS tokens_before,
         |       CAST(SUM(n_tokens - COALESCE(n_removed, 0)) AS BIGINT)
         |         AS tokens_after,
         |       CAST((SUM(n_tokens) - SUM(n_tokens - COALESCE(n_removed, 0)))
         |            * 1000000 // SUM(n_tokens) AS BIGINT) AS removed_ppm
         |FROM tb LEFT JOIN ip USING (doc_id) LEFT JOIN rm USING (doc_id)
         |GROUP BY source
         |ORDER BY source""".stripMargin,

    // Exact-substring dedup at the 50-token contract (Lee et al. 2022):
    // a position is covered when its literal 50-token span occurs >= 2
    // times corpus-wide; per-source covered-position union volumes. The
    // oracle groups directly on the literal span text — the engine's
    // rolling-hash tier is a prefilter whose collisions are verified
    // away, so literal-span grouping is the semantic ground truth.
    "q290_exact_substring" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |oc AS (SELECT doc_id, CAST(g - 1 AS BIGINT) AS pos,
         |         array_to_string(list_slice(toks, g, g + 49), ' ') AS span
         |       FROM (SELECT doc_id, toks,
         |               unnest(range(1, len(toks) - 48)) AS g FROM tk) z),
         |dp AS (SELECT span FROM oc GROUP BY span HAVING COUNT(*) > 1),
         |cv AS (SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS p FROM (
         |         SELECT doc_id, unnest(range(pos, pos + 50)) AS p
         |         FROM oc JOIN dp USING (span)) z),
         |rm AS (SELECT doc_id, COUNT(*) AS n_removed FROM cv GROUP BY doc_id),
         |sz AS (SELECT d.doc_id, d.source,
         |         CAST(len(string_split(n.t, ' ')) AS BIGINT) AS n_tokens
         |       FROM documents d JOIN n USING (doc_id))
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN COALESCE(n_removed, 0) > 0 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_affected,
         |       CAST(SUM(n_tokens) AS BIGINT) AS tokens_before,
         |       CAST(SUM(n_tokens - COALESCE(n_removed, 0)) AS BIGINT)
         |         AS tokens_after,
         |       CAST(SUM(COALESCE(n_removed, 0)) * 1000000 // SUM(n_tokens)
         |         AS BIGINT) AS removed_ppm
         |FROM sz LEFT JOIN rm USING (doc_id)
         |GROUP BY source
         |ORDER BY source""".stripMargin,
    // Keep-first exact-substring dedup (Lee et al. 2022's shipped
    // variant): per duplicated literal 50-token span, the first
    // occurrence by (doc_id, pos) survives; non-first occurrences'
    // covered-position union is scrubbed. The oracle ranks span groups
    // directly on the literal text (the engine's hash tier is a
    // verified prefilter, so span grouping is the ground truth).
    "q307_exact_substr_keep1" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |oc AS (SELECT doc_id, CAST(g - 1 AS BIGINT) AS pos,
         |         array_to_string(list_slice(toks, g, g + 49), ' ') AS span
         |       FROM (SELECT doc_id, toks,
         |               unnest(range(1, len(toks) - 48)) AS g FROM tk) z),
         |dp AS (SELECT span FROM oc GROUP BY span HAVING COUNT(*) > 1),
         |rk AS MATERIALIZED (SELECT doc_id, pos,
         |         row_number() OVER (PARTITION BY span
         |           ORDER BY doc_id, pos) AS rn
         |       FROM oc JOIN dp USING (span)),
         |cv AS (SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS p FROM (
         |         SELECT doc_id, unnest(range(pos, pos + 50)) AS p
         |         FROM rk WHERE rn >= 2) z),
         |rm AS (SELECT doc_id, COUNT(*) AS n_removed FROM cv GROUP BY doc_id),
         |kp AS (SELECT doc_id, COUNT(*) AS n_kept FROM rk WHERE rn = 1
         |       GROUP BY doc_id),
         |dd AS (SELECT doc_id, COUNT(*) AS n_dup FROM rk WHERE rn >= 2
         |       GROUP BY doc_id),
         |sz AS (SELECT d.doc_id, d.source,
         |         CAST(len(string_split(n.t, ' ')) AS BIGINT) AS n_tokens
         |       FROM documents d JOIN n USING (doc_id))
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN COALESCE(n_removed, 0) > 0 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_affected,
         |       CAST(SUM(n_tokens) AS BIGINT) AS tokens_before,
         |       CAST(SUM(n_tokens - COALESCE(n_removed, 0)) AS BIGINT)
         |         AS tokens_after,
         |       CAST(SUM(COALESCE(n_removed, 0)) * 1000000 // SUM(n_tokens)
         |         AS BIGINT) AS removed_ppm,
         |       CAST(SUM(COALESCE(n_kept, 0)) AS BIGINT) AS n_kept_occ,
         |       CAST(SUM(COALESCE(n_dup, 0)) AS BIGINT) AS n_dup_occ
         |FROM sz LEFT JOIN rm USING (doc_id)
         |     LEFT JOIN kp USING (doc_id)
         |     LEFT JOIN dd USING (doc_id)
         |GROUP BY source
         |ORDER BY source""".stripMargin,
    // Train/test near-dup leakage: the q34 verified pair tier crossed
    // with the q52 affine-mod split; full 6-cell spine, cross-split
    // cells flagged, shares in exact ppm.
    "q302_split_leakage" ->
      s"""WITH $nCte,
         |$minhashCtes,
         |pv AS (SELECT iv.doc_a, iv.doc_b
         |       FROM iv JOIN sz za ON za.doc_id = iv.doc_a
         |               JOIN sz zb ON zb.doc_id = iv.doc_b
         |       WHERE CAST(n_inter AS DOUBLE)/(za.n+zb.n-n_inter) >= 0.8),
         |sp AS (SELECT doc_id, CASE WHEN $bucketExpr < 90 THEN 'train'
         |         WHEN $bucketExpr < 95 THEN 'val' ELSE 'test' END AS split
         |       FROM documents),
         |tg AS (SELECT LEAST(a.split, b.split) AS split_lo,
         |         GREATEST(a.split, b.split) AS split_hi
         |       FROM pv JOIN sp a ON pv.doc_a = a.doc_id
         |               JOIN sp b ON pv.doc_b = b.doc_id),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM tg),
         |nm AS (SELECT unnest(['test', 'train', 'val']) AS s),
         |spn AS (SELECT a.s AS split_lo, b.s AS split_hi
         |        FROM nm a JOIN nm b ON a.s <= b.s),
         |ct AS (SELECT split_lo, split_hi, CAST(COUNT(*) AS BIGINT)
         |         AS n_pairs FROM tg GROUP BY 1, 2)
         |SELECT spn.split_lo, spn.split_hi,
         |       COALESCE(ct.n_pairs, 0) AS n_pairs,
         |       CAST(CASE WHEN spn.split_lo <> spn.split_hi THEN 1 ELSE 0
         |         END AS INT) AS is_leak,
         |       CAST(CASE WHEN tot.n_total = 0 THEN 0
         |         ELSE COALESCE(ct.n_pairs, 0) * 1000000 // tot.n_total
         |         END AS BIGINT) AS share_ppm
         |FROM spn LEFT JOIN ct
         |  ON spn.split_lo = ct.split_lo AND spn.split_hi = ct.split_hi
         |CROSS JOIN tot
         |ORDER BY spn.split_lo, spn.split_hi""".stripMargin,
    // URL/host dedup tier: the synthetic 3-variant url fixture, the
    // 6-step canonicalization (lower, scheme strip, www strip, query
    // at first '?', trailing-slash strip, utm-drop + param sort),
    // keep-first exact-URL dedup, then the q63 hash-order per-host
    // quota (cap 6). kept_id_sum pins the exact winner set.
    "q316_url_host_dedup" ->
      s"""WITH u AS (SELECT doc_id,
         |         CASE (doc_id // 20) % 3
         |           WHEN 0 THEN 'https://www.' || source || '.example.com/docs/'
         |             || CAST(doc_id // 60 AS VARCHAR) || '?utm_source=feed&b=2&a=1'
         |           WHEN 1 THEN 'http://' || source || '.example.com/docs/'
         |             || CAST(doc_id // 60 AS VARCHAR) || '/?a=1&b=2'
         |           ELSE 'HTTPS://' || source || '.example.com/docs/'
         |             || CAST(doc_id // 60 AS VARCHAR) || '?b=2&a=1'
         |         END AS url
         |       FROM documents),
         |c1 AS (SELECT doc_id,
         |         regexp_replace(regexp_replace(lower(trim(url)),
         |           '^https?://', ''), '^www\\.', '') AS v
         |       FROM u),
         |c2 AS (SELECT doc_id, string_split(v, '?') AS parts FROM c1),
         |c3 AS (SELECT doc_id,
         |         regexp_replace(parts[1], '/+$$', '') AS path,
         |         CASE WHEN len(parts) > 1 THEN parts[2] ELSE '' END AS q
         |       FROM c2),
         |c4 AS (SELECT doc_id, path,
         |         array_to_string(list_sort(list_filter(string_split(q, '&'),
         |           p -> NOT starts_with(p, 'utm_') AND p <> '')), '&') AS sq
         |       FROM c3),
         |canon AS (SELECT doc_id,
         |            path || CASE WHEN length(sq) > 0 THEN '?' || sq
         |                         ELSE '' END AS curl,
         |            split_part(path, '/', 1) AS host
         |          FROM c4),
         |w AS (SELECT host, curl, MIN(doc_id) AS doc_id,
         |        COUNT(*) AS n_copies
         |      FROM canon GROUP BY 1, 2),
         |ranked AS (SELECT host, doc_id, ROW_NUMBER() OVER (
         |             PARTITION BY host ORDER BY $bucketExpr, doc_id)
         |             AS qrank
         |           FROM w),
         |kept AS (SELECT host, doc_id FROM ranked WHERE qrank <= 6),
         |hd AS (SELECT host, COUNT(*) AS n_docs FROM canon GROUP BY 1),
         |hu AS (SELECT host, COUNT(*) AS n_urls FROM w GROUP BY 1),
         |hk AS (SELECT host, COUNT(*) AS n_kept, SUM(doc_id) AS kept_id_sum
         |       FROM kept GROUP BY 1)
         |SELECT host, CAST(n_docs AS BIGINT) AS n_docs,
         |       CAST(n_urls AS BIGINT) AS n_urls,
         |       CAST(n_docs - n_urls AS BIGINT) AS n_dup_removed,
         |       CAST(n_kept AS BIGINT) AS n_kept,
         |       CAST(n_urls - n_kept AS BIGINT) AS n_cap_removed,
         |       CAST((n_docs - n_urls) * 1000000 // n_docs AS BIGINT)
         |         AS dup_ppm,
         |       CAST(kept_id_sum AS BIGINT) AS kept_id_sum
         |FROM hd JOIN hu USING (host) JOIN hk USING (host)
         |ORDER BY host""".stripMargin,
  )
}
