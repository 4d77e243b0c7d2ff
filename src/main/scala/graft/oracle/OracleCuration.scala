package graft.oracle

import graft.oracle.OracleDialect._

/** DuckDB oracle SQL — curation tier
  * (26 queries). Values are verbatim from SparkEntry.scala
  * (round-11 mechanical split); SparkEntry.oracleSql concatenates the
  * domain maps, and QueriesSpec pins key-set equality (both directions) with the
  * query registry. */
object OracleCuration {
  /** The q309 measured-loss MW base, shared with the q311 trajectory:
    * the q181 LM chain (per-doc floored NLL), source rollup, token
    * share, and the linearized EG factor — ends at `r2(source, n_docs,
    * nb, share_ppm, nll_micro, excess_micro, factor_micro, raw)`. */
  private lazy val mwBaseCtes: String =
    """b AS (SELECT doc_id, substr(t, CAST(g AS INT), 2) AS bg
      |      FROM (SELECT doc_id, t, unnest(range(1, length(t))) AS g
      |            FROM n) z),
      |dc AS (SELECT doc_id, bg, COUNT(*) AS c FROM b GROUP BY doc_id, bg),
      |m AS (SELECT bg, SUM(c) AS cnt FROM dc GROUP BY bg),
      |mar AS (SELECT substr(bg, 1, 1) AS c1, SUM(cnt) AS tot
      |        FROM m GROUP BY c1),
      |v AS (SELECT COUNT(DISTINCT substr(bg, 2, 1)) AS vv FROM m),
      |lp AS (SELECT m.bg,
      |              CAST(ROUND(-ln((m.cnt + 1.0)/(mar.tot + v.vv))
      |                         * 1000000, 0) AS BIGINT) AS lp
      |       FROM m JOIN mar ON substr(m.bg, 1, 1) = mar.c1 CROSS JOIN v),
      |s AS (SELECT dc.doc_id, SUM(dc.c) AS nb, SUM(dc.c * lp.lp) AS sl
      |      FROM dc JOIN lp ON dc.bg = lp.bg GROUP BY dc.doc_id),
      |pd AS (SELECT d.doc_id, d.source,
      |         COALESCE(CAST(s.nb AS BIGINT), 0) AS nb,
      |         CASE WHEN COALESCE(s.nb, 0) = 0 THEN 0
      |           ELSE CAST(s.sl // s.nb AS BIGINT) END AS nll
      |       FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id),
      |per AS (SELECT source, COUNT(*) AS n_docs,
      |          CAST(SUM(nb) AS BIGINT) AS nb,
      |          CAST(SUM(nb * nll) AS BIGINT) AS snl
      |        FROM pd GROUP BY source),
      |tot AS (SELECT CAST(SUM(nb) AS BIGINT) AS tb,
      |          CAST(SUM(snl) AS BIGINT) AS ts FROM per),
      |rep AS (SELECT source, n_docs, nb,
      |          CASE WHEN tb = 0 THEN 0
      |            ELSE nb * 1000000 // tb END AS share_ppm,
      |          CASE WHEN nb = 0 THEN 0 ELSE snl // nb END AS nll_micro,
      |          CASE WHEN tb = 0 THEN 0 ELSE ts // tb END AS nll_bar
      |        FROM per CROSS JOIN tot),
      |r2 AS (SELECT source, n_docs, nb, share_ppm, nll_micro,
      |          nll_micro - nll_bar AS excess_micro,
      |          GREATEST(1, 1000000 + nll_micro - nll_bar)
      |            AS factor_micro,
      |          share_ppm * GREATEST(1, 1000000 + nll_micro - nll_bar)
      |            AS raw
      |        FROM rep)""".stripMargin

  /** q311: the q309 MW step unrolled through 4 materialized rounds —
    * per round, raw = share·factor (int64 by the q309 bounds), the
    * HUGEINT-guarded floor renormalization, the per-source movement,
    * and the round's L1-movement + Σshare certificates. */
  private lazy val mwTrajectorySql: String = {
    val rounds = graft.queries.CurationQueries.MwTrajectoryRounds
    val roundCtes = (1 to rounds).map { t =>
      s"""x$t AS (SELECT source, factor_micro, share_ppm AS prev,
         |        share_ppm * factor_micro AS raw FROM w${t - 1}),
         |t$t AS (SELECT SUM(raw) AS rt FROM x$t),
         |w$t AS MATERIALIZED (SELECT source, factor_micro, prev,
         |        CAST(CASE WHEN rt = 0 THEN 0
         |          ELSE CAST(raw AS HUGEINT) * 1000000 // rt END AS BIGINT)
         |          AS share_ppm
         |       FROM x$t CROSS JOIN t$t),
         |g$t AS (SELECT SUM(ABS(share_ppm - prev)) AS l1,
         |          SUM(share_ppm) AS ss FROM w$t)""".stripMargin
    }.mkString(",\n")
    val legs = (1 to rounds).map { t =>
      s"""SELECT $t AS round, source, prev, share_ppm, factor_micro, l1, ss
         |FROM w$t CROSS JOIN g$t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $nCte,
       |$mwBaseCtes,
       |w0 AS MATERIALIZED (SELECT source, share_ppm, factor_micro FROM r2),
       |$roundCtes
       |SELECT CAST(round AS INT) AS round, source,
       |       CAST(prev AS BIGINT) AS prev_share_ppm,
       |       CAST(share_ppm AS BIGINT) AS share_ppm,
       |       CAST(share_ppm - prev AS BIGINT) AS delta_ppm,
       |       CAST(factor_micro AS BIGINT) AS factor_micro,
       |       CAST(l1 AS BIGINT) AS l1_move_ppm,
       |       CAST(ss AS BIGINT) AS sum_share_ppm
       |FROM ($legs)
       |ORDER BY round, source""".stripMargin
  }
  /** q277 packing sweep (generated): ONE shared exclusive-prefix CTE,
    * per-budget bin rollups unioned — mirrors Packing.packingSweep's
    * single-pass shape (floor(prefix / b.0), the q59 idiom). */
  /** q318: the adaptive MW trajectory — the q311 unroll with the
    * mixture-mean loss RE-MEASURED per round from the current weights
    * (HUGEINT-floored weighted mean), so each round's factor is
    * recomputed, never static. */
  private lazy val mwAdaptiveSql: String = {
    val rounds = graft.queries.CurationQueries.MwTrajectoryRounds
    val roundCtes = (1 to rounds).map { t =>
      s"""bt$t AS (SELECT CASE WHEN SUM(share_ppm) = 0 THEN 0
         |          ELSE CAST(SUM(CAST(share_ppm AS HUGEINT) * nll_micro)
         |            // SUM(share_ppm) AS BIGINT) END AS nll_bar_micro
         |        FROM w${t - 1}),
         |x$t AS (SELECT source, nll_micro, share_ppm AS prev,
         |          bt$t.nll_bar_micro AS nll_bar_micro,
         |          GREATEST(1, 1000000 + nll_micro - bt$t.nll_bar_micro)
         |            AS factor_micro,
         |          share_ppm * GREATEST(1, 1000000 + nll_micro
         |            - bt$t.nll_bar_micro) AS raw
         |        FROM w${t - 1} CROSS JOIN bt$t),
         |t$t AS (SELECT SUM(raw) AS rt FROM x$t),
         |w$t AS MATERIALIZED (SELECT source, nll_micro, prev,
         |        nll_bar_micro, factor_micro,
         |        CAST(CASE WHEN rt = 0 THEN 0
         |          ELSE CAST(raw AS HUGEINT) * 1000000 // rt END AS BIGINT)
         |          AS share_ppm
         |       FROM x$t CROSS JOIN t$t),
         |g$t AS (SELECT SUM(ABS(share_ppm - prev)) AS l1,
         |          SUM(share_ppm) AS ss FROM w$t)""".stripMargin
    }.mkString(",\n")
    val legs = (1 to rounds).map { t =>
      s"""SELECT $t AS round, source, prev, share_ppm, factor_micro,
         |       nll_bar_micro, l1, ss
         |FROM w$t CROSS JOIN g$t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $nCte,
       |$mwBaseCtes,
       |w0 AS MATERIALIZED (SELECT source, share_ppm, nll_micro FROM rep),
       |$roundCtes
       |SELECT CAST(round AS INT) AS round, source,
       |       CAST(prev AS BIGINT) AS prev_share_ppm,
       |       CAST(share_ppm AS BIGINT) AS share_ppm,
       |       CAST(share_ppm - prev AS BIGINT) AS delta_ppm,
       |       CAST(factor_micro AS BIGINT) AS factor_micro,
       |       CAST(nll_bar_micro AS BIGINT) AS nll_bar_micro,
       |       CAST(l1 AS BIGINT) AS l1_move_ppm,
       |       CAST(ss AS BIGINT) AS sum_share_ppm
       |FROM ($legs)
       |ORDER BY round, source""".stripMargin
  }

  private lazy val packingSweepSql: String = {
    val budgets = Seq(256, 512, 1024, 2048)
    val per = budgets.map { b =>
      s"""g$b AS (SELECT CAST(floor(prefix / $b.0) AS BIGINT) AS bin,
         |         SUM(n_tokens) AS fill
         |       FROM p GROUP BY 1),
         |a$b AS (SELECT COUNT(*) AS n_bins,
         |         CAST(SUM(fill) AS BIGINT) AS total_tokens,
         |         CAST(SUM(CASE WHEN fill > $b THEN fill - $b ELSE 0 END)
         |           AS BIGINT) AS overhang_tokens,
         |         CAST(SUM(CASE WHEN fill > $b THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_overhang
         |       FROM g$b)""".stripMargin
    }.mkString(",\n")
    val rows = budgets.map { b =>
      s"""SELECT CAST($b AS INT) AS budget,
         |  CAST(n_bins AS BIGINT) AS n_bins, total_tokens,
         |  CAST(total_tokens * 1000000 // (n_bins * $b) AS BIGINT)
         |    AS avg_fill_ppm,
         |  n_overhang AS n_overhang_bins, overhang_tokens,
         |  CAST(overhang_tokens * 1000000 // total_tokens AS BIGINT)
         |    AS overhang_ppm
         |FROM a$b""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $nCte,
       |c AS (SELECT doc_id,
       |        CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens
       |      FROM n),
       |p AS (SELECT doc_id, n_tokens,
       |        COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          AS prefix
       |      FROM c),
       |$per
       |$rows
       |ORDER BY budget""".stripMargin
  }

  private[graft] val sql: Map[String, String] = Map(
    // Packing-efficiency frontier (generated — see packingSweepSql).
    "q277_packing_sweep" -> packingSweepSql,

    "q52_hash_split" ->
      s"""WITH b AS (SELECT doc_id, length(text) AS len, $bucketExpr AS bucket
         |           FROM documents)
         |SELECT CASE WHEN bucket < 90 THEN 'train'
         |            WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
         |       COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
         |       CAST(SUM(len) AS BIGINT) AS sum_chars,
         |       CAST(SUM(CASE WHEN bucket < 10 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_in_10pct_sample
         |FROM b GROUP BY 1
         |ORDER BY split""".stripMargin,
    "q59_sequence_packing" ->
      s"""WITH $nCte,
         |c AS (SELECT doc_id, CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens
         |      FROM n),
         |p AS (SELECT doc_id, n_tokens,
         |             CAST(floor(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |               / 2048.0) AS BIGINT) AS bin
         |      FROM c)
         |SELECT bin, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         |       MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
         |FROM p GROUP BY bin
         |ORDER BY bin""".stripMargin,
    "q57_stratified_mix" ->
      s"""WITH b AS (SELECT lang, $bucketExpr AS bucket FROM documents),
         |k AS (SELECT lang, COUNT(*) AS n_kept FROM b
         |      WHERE bucket < (CASE lang WHEN 'en' THEN 25
         |                                WHEN 'zh' THEN 100 ELSE 60 END)
         |      GROUP BY lang),
         |t AS (SELECT lang, COUNT(*) AS n_total FROM b GROUP BY lang)
         |SELECT t.lang, t.n_total, COALESCE(k.n_kept, 0) AS n_kept,
         |       ROUND(CAST(COALESCE(k.n_kept, 0) AS DOUBLE)/t.n_total, 4) AS kept_rate
         |FROM t LEFT JOIN k ON t.lang = k.lang
         |ORDER BY t.lang""".stripMargin,
    "q63_source_quota" ->
      s"""WITH ranked AS (
         |  SELECT source, doc_id, n_chars,
         |         ROW_NUMBER() OVER (PARTITION BY source
         |           ORDER BY $bucketExpr, doc_id) AS qrank
         |  FROM documents)
         |SELECT source, doc_id, n_chars
         |FROM ranked WHERE qrank <= 15
         |ORDER BY source, doc_id""".stripMargin,
    "q64_shard_shuffle" ->
      s"""WITH s AS (
         |  SELECT doc_id,
         |         CAST((((doc_id % ${graft.ext.TextOps.HashP}) * 2654435761 + 97)
         |           % ${graft.ext.TextOps.HashP}) % 8 AS INT) AS shard
         |  FROM documents)
         |SELECT doc_id, shard,
         |       CAST(ROW_NUMBER() OVER (PARTITION BY shard
         |         ORDER BY $bucketExpr, doc_id) AS BIGINT) AS pos
         |FROM s
         |ORDER BY shard, pos""".stripMargin,
    "q65_snapshot_diff" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents),
         |v2 AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 13 = 1 THEN text || ' v2' ELSE text END AS text
         |  FROM base WHERE doc_id % 17 <> 3
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text FROM base WHERE doc_id % 29 = 0),
         |a AS (SELECT doc_id AS k, md5(text) AS old_hash FROM base),
         |b AS (SELECT doc_id AS k, md5(text) AS new_hash FROM v2),
         |j AS (SELECT COALESCE(a.k, b.k) AS doc_id, a.old_hash, b.new_hash
         |      FROM a FULL OUTER JOIN b ON a.k = b.k)
         |SELECT doc_id,
         |       CASE WHEN old_hash IS NULL THEN 'added'
         |            WHEN new_hash IS NULL THEN 'removed'
         |            WHEN old_hash <> new_hash THEN 'changed' END AS change_type,
         |       COALESCE(old_hash, '') AS old_hash,
         |       COALESCE(new_hash, '') AS new_hash
         |FROM j
         |WHERE old_hash IS NULL OR new_hash IS NULL OR old_hash <> new_hash
         |ORDER BY doc_id""".stripMargin,
    "q67_rarity_score" ->
      s"""WITH $nCte,
         |$tokCte,
         |v AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
         |r AS (SELECT w, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS BIGINT) AS rank
         |      FROM v QUALIFY rank <= 20)
         |SELECT t.doc_id, COUNT(*) AS n_tokens,
         |       CAST(SUM(CASE WHEN r.rank IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |       ROUND(CAST(SUM(r.rank) AS DOUBLE) / COUNT(r.rank), 4) AS mean_rank,
         |       ROUND(CAST(SUM(CASE WHEN r.rank IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |         / COUNT(*), 4) AS oov_rate
         |FROM tok t LEFT JOIN r ON t.w = r.w
         |GROUP BY t.doc_id
         |ORDER BY t.doc_id""".stripMargin,
    "q75_chunking" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |m AS (SELECT doc_id, toks,
         |        GREATEST((CAST(len(toks) AS BIGINT) - 16 + 47) // 48, 1) AS n_chunks
         |      FROM tk),
         |g AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_idx FROM m)
         |SELECT doc_id, chunk_idx,
         |       chunk_idx * 48 AS tok_start,
         |       CAST(len(list_slice(toks, chunk_idx*48 + 1, chunk_idx*48 + 64)) AS BIGINT)
         |         AS n_tok_chunk,
         |       array_to_string(list_slice(toks, chunk_idx*48 + 1, chunk_idx*48 + 64), ' ')
         |         AS chunk_text
         |FROM g
         |ORDER BY doc_id, chunk_idx""".stripMargin,
    // Temperature-scaled mixture: ⌊1e6·√n⌋ weights (IEEE sqrt is
    // correctly rounded — engine-identical), exact HUGEINT floor
    // division for the ppm rates, independent affine hash gate.
    "q138_temperature_mix" ->
      s"""WITH c AS (SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source),
         |w AS (SELECT source, n_total,
         |             CAST(floor(1000000*sqrt(n_total)) AS BIGINT) AS weight
         |      FROM c),
         |t AS (SELECT SUM(n_total) AS corpus_n, SUM(weight) AS sum_w FROM w),
         |r AS (SELECT source, n_total, weight,
         |             LEAST(1000000, CAST((CAST(1000000 AS HUGEINT) * (corpus_n*40//100) * weight)
         |               // (CAST(sum_w AS HUGEINT) * n_total) AS BIGINT)) AS rate_ppm
         |      FROM w CROSS JOIN t),
         |k AS (SELECT d.source, COUNT(*) AS n_kept
         |      FROM documents d JOIN r ON d.source = r.source
         |      WHERE (((d.doc_id % ${graft.ext.TextOps.HashP}) * 2654435761 + 97)
         |             % ${graft.ext.TextOps.HashP}) % 1000000 < r.rate_ppm
         |      GROUP BY d.source)
         |SELECT r.source, r.n_total, r.weight, r.rate_ppm,
         |       COALESCE(k.n_kept, 0) AS n_kept
         |FROM r LEFT JOIN k ON r.source = k.source
         |ORDER BY r.source""".stripMargin,
    // Temperature sweep: n^t weights via sqrt compositions (IEEE
    // exactly-rounded, engine-identical; no pow()), q138's exact rate
    // formula per temperature, inverse-Simpson effective source count.
    "q288_temperature_sweep" ->
      s"""WITH c AS (SELECT source, COUNT(*) AS n_total FROM documents
         |           GROUP BY source),
         |w AS (SELECT 25 AS tau_pct, source, n_total,
         |        CAST(floor(1000000*sqrt(sqrt(n_total))) AS BIGINT) AS weight_e6
         |      FROM c
         |      UNION ALL
         |      SELECT 50, source, n_total,
         |        CAST(floor(1000000*sqrt(n_total)) AS BIGINT) FROM c
         |      UNION ALL
         |      SELECT 75, source, n_total,
         |        CAST(floor(1000000*(sqrt(n_total)*sqrt(sqrt(n_total))))
         |          AS BIGINT) FROM c
         |      UNION ALL
         |      SELECT 100, source, n_total,
         |        CAST(n_total * 1000000 AS BIGINT) FROM c),
         |t AS (SELECT tau_pct, SUM(n_total) AS corpus_n,
         |             CAST(SUM(weight_e6) AS BIGINT) AS sum_w
         |      FROM w GROUP BY tau_pct),
         |r AS (SELECT w.tau_pct, w.source, w.n_total, w.weight_e6,
         |        LEAST(1000000, CAST((CAST(1000000 AS HUGEINT)
         |          * (corpus_n*40//100) * weight_e6)
         |          // (CAST(sum_w AS HUGEINT) * n_total) AS BIGINT)) AS rate_ppm
         |      FROM w JOIN t USING (tau_pct)),
         |k AS (SELECT *, CAST(n_total * rate_ppm // 1000000 AS BIGINT)
         |        AS n_kept_exp FROM r),
         |e AS (SELECT tau_pct,
         |        CAST(CASE WHEN SUM(CAST(n_kept_exp AS HUGEINT) * n_kept_exp) = 0
         |             THEN 0
         |             ELSE CAST(SUM(n_kept_exp) AS HUGEINT) * SUM(n_kept_exp)
         |                  * 1000 // SUM(CAST(n_kept_exp AS HUGEINT)
         |                  * n_kept_exp) END AS BIGINT) AS eff_sources_milli
         |      FROM k GROUP BY tau_pct)
         |SELECT CAST(k.tau_pct AS INT) AS tau_pct, k.source,
         |       CAST(k.n_total AS BIGINT) AS n_total, k.weight_e6,
         |       k.rate_ppm, k.n_kept_exp, e.eff_sources_milli
         |FROM k JOIN e USING (tau_pct)
         |ORDER BY tau_pct, source""".stripMargin,
    // Per-language 2048-token packing: independent bin sequences per
    // lang (the partitioned window IS the oracle semantics; the engine
    // recovers it from one global prefix sum).
    "q141_grouped_packing" ->
      s"""WITH nl AS (SELECT doc_id, lang,
         |                   lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
         |            FROM documents),
         |c AS (SELECT doc_id, lang,
         |             CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens
         |      FROM nl),
         |p AS (SELECT lang, doc_id, n_tokens,
         |             COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
         |      FROM c)
         |SELECT lang, CAST(pre // 2048 AS BIGINT) AS bin, COUNT(*) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         |       MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
         |FROM p GROUP BY lang, bin
         |ORDER BY lang, bin""".stripMargin,
    // Systematic PPS sampling: exclusive prefix over doc_id order, k=100
    // pointers, multiplicity = difference of exact integer ceils.
    "q144_systematic_sample" ->
      """WITH d AS (SELECT doc_id, source, n_chars,
        |                  GREATEST(CAST(n_chars AS BIGINT), 1) AS w FROM documents),
        |p AS (SELECT *,
        |             COALESCE(SUM(w) OVER (ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre,
        |             SUM(w) OVER () AS total
        |      FROM d),
        |m AS (SELECT doc_id, source, n_chars,
        |             CAST(((CAST(pre + w AS HUGEINT) * 100 + total - 1) // total)
        |                - ((CAST(pre AS HUGEINT) * 100 + total - 1) // total)
        |               AS BIGINT) AS multiplicity
        |      FROM p)
        |SELECT * FROM m WHERE multiplicity > 0
        |ORDER BY doc_id""".stripMargin,
    // End-to-end curation funnel: the q62 quality cascade, the q32
    // exact-dedup winner, the q138 temperature gate and the q59 packing
    // prefix, chained verbatim — per-source funnel + global bin count.
    "q162_curation_pipeline" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |m AS (SELECT doc_id,
         |        CAST(len(toks) AS BIGINT) AS n_tokens,
         |        list_sum(list_transform(toks, w -> CAST(length(w) AS BIGINT)))*1.0
         |          / len(toks) AS ml,
         |        len(list_filter(toks, w -> length(w) >= 7))*1.0 / len(toks) AS lf,
         |        CAST(len(list_filter(toks,
         |          w -> w IN ('the','a','of','and','to','in'))) AS BIGINT) AS ns
         |      FROM tk),
         |qd AS (SELECT doc_id FROM m
         |       WHERE NOT (n_tokens < 50) AND NOT (ml < 4.2 OR ml > 4.8)
         |         AND NOT (lf > 0.06) AND NOT (ns < 2)),
         |qn AS (SELECT n.doc_id, n.t FROM n JOIN qd ON n.doc_id = qd.doc_id),
         |rep AS (SELECT MIN(doc_id) AS doc_id FROM qn GROUP BY t),
         |dd AS (SELECT d.doc_id, d.source FROM documents d
         |       JOIN rep ON d.doc_id = rep.doc_id),
         |c AS (SELECT source, COUNT(*) AS n_total FROM dd GROUP BY source),
         |w AS (SELECT source, n_total,
         |             CAST(floor(1000000*sqrt(n_total)) AS BIGINT) AS weight
         |      FROM c),
         |t2 AS (SELECT SUM(n_total) AS corpus_n, SUM(weight) AS sum_w FROM w),
         |rt AS (SELECT source,
         |              LEAST(1000000, CAST((CAST(1000000 AS HUGEINT) * (corpus_n*40//100) * weight)
         |                // (CAST(sum_w AS HUGEINT) * n_total) AS BIGINT)) AS rate_ppm
         |       FROM w CROSS JOIN t2),
         |fin AS (SELECT dd.doc_id, dd.source FROM dd JOIN rt ON dd.source = rt.source
         |        WHERE (((dd.doc_id % ${graft.ext.TextOps.HashP}) * 2654435761 + 97)
         |               % ${graft.ext.TextOps.HashP}) % 1000000 < rt.rate_ppm),
         |ft AS (SELECT f.doc_id, f.source,
         |              CAST(len(string_split(n.t, ' ')) AS BIGINT) AS n_tokens
         |       FROM fin f JOIN n ON f.doc_id = n.doc_id),
         |pre AS (SELECT doc_id,
         |               COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
         |        FROM ft),
         |nb AS (SELECT COUNT(DISTINCT pre // 2048) AS n_bins_global FROM pre),
         |c0 AS (SELECT source, COUNT(*) AS n_input FROM documents GROUP BY source),
         |c1 AS (SELECT d.source, COUNT(*) AS n_quality FROM documents d
         |       JOIN qd ON d.doc_id = qd.doc_id GROUP BY d.source),
         |c2 AS (SELECT source, COUNT(*) AS n_dedup FROM dd GROUP BY source),
         |c3 AS (SELECT source, COUNT(*) AS n_final,
         |              CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens_final
         |       FROM ft GROUP BY source)
         |SELECT c0.source, c0.n_input,
         |       COALESCE(n_quality, 0) AS n_quality,
         |       COALESCE(n_dedup, 0) AS n_dedup,
         |       COALESCE(n_final, 0) AS n_final,
         |       COALESCE(sum_tokens_final, 0) AS sum_tokens_final,
         |       nb.n_bins_global
         |FROM c0 LEFT JOIN c1 USING (source) LEFT JOIN c2 USING (source)
         |LEFT JOIN c3 USING (source) CROSS JOIN nb
         |ORDER BY c0.source""".stripMargin,
    // Heaps'-law content growth: first-doc per distinct char-8-gram
    // shingle hash, 50-doc slices, cumulative shingle vocabulary.
    "q164_content_growth" ->
      s"""WITH $nCte,
         |$char8HashCte,
         |f AS (SELECT hv, MIN(doc_id) AS first_doc FROM h GROUP BY hv),
         |b AS (SELECT first_doc // 50 AS bucket, COUNT(*) AS n_new_shingles
         |      FROM f GROUP BY bucket)
         |SELECT bucket, n_new_shingles,
         |       CAST(SUM(n_new_shingles) OVER (ORDER BY bucket
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |         AS cum_shingles
         |FROM b ORDER BY bucket""".stripMargin,
    // Source-level MinHash: per-source union signatures from the same
    // Perms table, pairwise matching-hash counts.
    "q165_source_similarity" ->
      s"""WITH $nCte,
         |z AS (SELECT doc_id, t, unnest(range(1, length(t)-6)) AS g FROM n),
         |sh AS (SELECT d.source, ${hv8("substr(z.t, z.g, 8)")} AS hv
         |       FROM z JOIN documents d ON z.doc_id = d.doc_id),
         |perms AS (SELECT * FROM (VALUES $permValues) AS p(j, band, slot, a, b, w)),
         |m AS (SELECT source, j, MIN((hv * a + b) % ${graft.ext.TextOps.HashP}) AS mh
         |      FROM sh CROSS JOIN perms GROUP BY source, j),
         |pr AS (SELECT x.source AS source_a, y.source AS source_b,
         |              CAST(SUM(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS INT)
         |                AS n_matching
         |       FROM m x JOIN m y ON x.j = y.j AND x.source < y.source
         |       GROUP BY x.source, y.source)
         |SELECT source_a, source_b, n_matching,
         |       CAST(n_matching AS DOUBLE)/16.0 AS est_similarity
         |FROM pr ORDER BY source_a, source_b""".stripMargin,
    // KMV set-operation sketches: k smallest full-range affine hashes of
    // each source's distinct shingle set; D-hat = (k-1)*P div m_k, union
    // by sort-and-truncate merge, intersection via the sketch-overlap
    // fraction of the union estimate. All-integer, value-reproducible.
    "q180_source_set_ops" ->
      s"""WITH $nCte,
         |z AS (SELECT doc_id, t, unnest(range(1, length(t)-6)) AS g FROM n),
         |sh AS (SELECT DISTINCT d.source,
         |              (((${hv8("substr(z.t, z.g, 8)")}) * 2654435761 + 97)
         |               % ${graft.ext.TextOps.HashP}) AS h
         |       FROM z JOIN documents d ON z.doc_id = d.doc_id),
         |r AS (SELECT source, h,
         |             row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |      FROM sh),
         |sk AS (SELECT source, list(h ORDER BY h) AS sk
         |       FROM r WHERE rn <= 128 GROUP BY source),
         |e AS (SELECT source, sk,
         |             CASE WHEN len(sk) < 128 THEN CAST(len(sk) AS BIGINT)
         |                  ELSE ${127L * graft.ext.TextOps.HashP} // sk[128]
         |             END AS est
         |      FROM sk),
         |pr AS (SELECT a.source AS source_a, b.source AS source_b,
         |              a.sk AS sa, b.sk AS sb,
         |              a.est AS est_distinct_a, b.est AS est_distinct_b
         |       FROM e a JOIN e b ON a.source < b.source),
         |uu AS (SELECT *, list_sort(list_distinct(list_concat(sa, sb)))[1:128]
         |                 AS u FROM pr),
         |u2 AS (SELECT *, CAST(len(u) AS BIGINT) AS nu,
         |              CASE WHEN len(u) < 128 THEN CAST(len(u) AS BIGINT)
         |                   ELSE ${127L * graft.ext.TextOps.HashP} // u[128]
         |              END AS est_union,
         |              CAST(len(list_intersect(list_intersect(u, sa), sb))
         |                   AS BIGINT) AS inter_in_u
         |       FROM uu)
         |SELECT source_a, source_b, est_distinct_a, est_distinct_b, est_union,
         |       (inter_in_u * est_union) // nu AS est_inter,
         |       (inter_in_u * 1000) // nu AS jaccard_milli
         |FROM u2 ORDER BY source_a, source_b""".stripMargin,
    // TPC-H Q12 shape: late shipments split by order priority.
    "q168_late_priority_mix" ->
      """SELECT l_returnflag,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high_priority,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS n_low_priority
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE date_diff('day', CAST(o_orderdate AS DATE),
        |                CAST(l_shipdate AS DATE)) > 60
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // Threshold-sampled distinct profile: one UNION ALL branch per
    // column, each recomputing the SAME affine-hash slice estimator —
    // canonicalizations mirror ProfileAnalytics.LineitemCanon exactly.
    "q176_profile_sampled" -> {
      val P = graft.ext.TextOps.HashP
      val tDiv = 16L
      val thresh = P / tDiv
      val canonSql: Seq[(String, String)] =
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
          .map(c => c -> s"CAST($c AS BIGINT)") ++
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
          .map(c => c -> s"CAST(ROUND($c*10000,0) AS BIGINT)") ++
        Seq("l_returnflag", "l_linestatus")
          .map(c => c -> hv8(s"rpad($c, 8, '#')")) ++
        Seq("l_shipdate" ->
          "CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS BIGINT)")
      canonSql.map { case (name, canon) =>
        s"""SELECT '$name' AS column_name, COUNT(*) AS n_rows,
           |  COUNT(*) - COUNT(canon) AS n_nulls,
           |  COUNT(DISTINCT CASE WHEN h < $thresh THEN h END) AS n_sketch_keys,
           |  COUNT(DISTINCT CASE WHEN h < $thresh THEN h END) * $tDiv AS n_distinct_est
           |FROM (SELECT canon, ((canon % $P) * 2654435761 + 97) % $P AS h
           |      FROM (SELECT $canon AS canon FROM lineitem) z0) z1""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },
    // Per-column profile: one UNION ALL branch per lineitem column —
    // generated from the same static column list the engine profiles.
    "q161_table_profile" -> {
      val liCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      liCols.map { c =>
        s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
           |CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
           |CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },
    // Inverse Simpson effective language count per source, exact milli.
    "q160_source_diversity" ->
      """WITH c AS (SELECT source, lang, COUNT(*) AS n FROM documents
        |           GROUP BY source, lang),
        |g AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
        |             CAST(COUNT(*) AS INT) AS n_langs,
        |             CAST(SUM(n*n) AS BIGINT) AS sq
        |      FROM c GROUP BY source)
        |SELECT source, n_docs, n_langs,
        |       CAST(CAST(n_docs AS HUGEINT) * n_docs * 1000 // sq AS BIGINT)
        |         AS inv_simpson_milli
        |FROM g ORDER BY source""".stripMargin,

    // Waterfilling: sorted-desc prefix state, the sequential cap test on
    // the maximal all-true prefix, then two scalar aggregates set the
    // water level.
    "q204_token_budget" ->
      """WITH n2 AS (SELECT source,
        |              lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |            FROM documents),
        |c AS (SELECT source, SUM(len(string_split(t, ' '))) AS tokens
        |      FROM n2 GROUP BY 1),
        |tt AS (SELECT CAST(SUM(tokens) AS HUGEINT) AS totc FROM c),
        |r AS (SELECT source, CAST(tokens AS HUGEINT) AS tokens, totc,
        |        totc * 50 // 100 AS b,
        |        (totc * 50 // 100) * 30 // 100 AS cap,
        |        row_number() OVER (ORDER BY tokens DESC, source) AS rk,
        |        SUM(CAST(tokens AS HUGEINT)) OVER (
        |          ORDER BY tokens DESC, source
        |          ROWS UNBOUNDED PRECEDING) AS pref
        |      FROM c, tt),
        |ct AS (SELECT *, CASE WHEN (b - (rk-1)*cap) * tokens
        |                        > cap * (totc - (pref - tokens))
        |                 THEN 1 ELSE 0 END AS cap_test FROM r),
        |cp AS (SELECT *, CASE WHEN min(cap_test) OVER (
        |          ORDER BY tokens DESC, source ROWS UNBOUNDED PRECEDING) = 1
        |        THEN 1 ELSE 0 END AS capped FROM ct),
        |sel AS (SELECT SUM(capped) AS jstar,
        |          COALESCE(SUM(CASE WHEN capped = 1 THEN tokens END), 0)
        |            AS cap_pref
        |        FROM cp),
        |f AS (SELECT cp.*, sel.jstar, sel.cap_pref,
        |        cp.b - sel.jstar * cp.cap AS rem,
        |        cp.totc - sel.cap_pref AS restc
        |      FROM cp, sel)
        |SELECT source, CAST(tokens AS BIGINT) AS tokens,
        |       CAST(CASE WHEN capped = 1 THEN cap
        |            ELSE tokens * rem // greatest(restc, 1) END AS BIGINT)
        |         AS alloc_tokens,
        |       CAST(capped AS INT) AS capped,
        |       CAST(CASE WHEN capped = 1 THEN cap
        |              ELSE tokens * rem // greatest(restc, 1) END
        |            * 1000000 // tokens AS BIGINT) AS epochs_ppm
        |FROM f ORDER BY tokens DESC, source""".stripMargin,

    "q208_pct_normalize" ->
      """WITH n2 AS (SELECT source, doc_id,
        |              lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |            FROM documents),
        |tk AS (SELECT source, doc_id, unnest(string_split(t, ' ')) AS w
        |       FROM n2),
        |st AS (SELECT source, doc_id,
        |         CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |         CAST(SUM(CASE WHEN w IN ('the','a','of','and','to','in')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
        |       FROM tk GROUP BY 1, 2),
        |sc AS (SELECT source, doc_id,
        |         n_stop * 1000000 // greatest(n_tokens, 1) AS score_ppm
        |       FROM st),
        |r AS (SELECT source, doc_id, score_ppm,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY score_ppm DESC, doc_id) AS rk,
        |        COUNT(*) OVER (PARTITION BY source) AS n
        |      FROM sc)
        |SELECT source, doc_id, CAST(score_ppm AS BIGINT) AS score_ppm,
        |       CAST((rk - 1) * 1000000 // greatest(n - 1, 1) AS BIGINT)
        |         AS pct_ppm
        |FROM r ORDER BY source, doc_id""".stripMargin,

    // 80/20 affine hash split; eval docs colliding with ANY train band
    // bucket (the q34 LSH signatures) are evicted via NOT EXISTS.
    "q219_eval_split" ->
      s"""WITH $nCte,
         |$minhashCtes,
         |tr AS (SELECT DISTINCT band, band_hash FROM bh
         |       WHERE $bucketExpr < 80),
         |lk AS (SELECT DISTINCT doc_id FROM bh
         |       JOIN tr ON bh.band = tr.band AND bh.band_hash = tr.band_hash
         |       WHERE $bucketExpr >= 80)
         |SELECT doc_id, lang, source, n_chars
         |FROM documents
         |WHERE $bucketExpr >= 80
         |  AND NOT EXISTS (SELECT 1 FROM lk WHERE lk.doc_id = documents.doc_id)
         |ORDER BY doc_id""".stripMargin,

    // Per-source data card: the q28/q29/q30/q32 per-doc components
    // rolled up per source; majority language ties to the smallest
    // lang code; all rates exact floor ppm.
    "q231_source_data_card" ->
      s"""WITH $nCte,
         |$tokCte,
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              SUM(CASE WHEN w IN ('the','a','of','and','to','in')
         |                  THEN 1 ELSE 0 END) AS n_stop
         |       FROM tok GROUP BY doc_id),
         |q AS (SELECT doc_id,
         |        CASE WHEN n_tokens BETWEEN 10 AND 1000
         |                  AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.05
         |             THEN 1 ELSE 0 END AS is_quality
         |      FROM st),
         |lsc AS (SELECT doc_id,
         |        CAST(SUM(CASE WHEN w IN ('the','a','of','and') THEN 1 ELSE 0 END) AS BIGINT) AS s_en,
         |        CAST(SUM(CASE WHEN w IN ('der','und','die','ist') THEN 1 ELSE 0 END) AS BIGINT) AS s_de,
         |        CAST(SUM(CASE WHEN w IN ('le','et','les','une') THEN 1 ELSE 0 END) AS BIGINT) AS s_fr,
         |        CAST(SUM(CASE WHEN w IN ('el','y','los','las') THEN 1 ELSE 0 END) AS BIGINT) AS s_es
         |        FROM tok GROUP BY doc_id),
         |lg AS (SELECT doc_id,
         |         CASE WHEN s_en+s_de+s_fr+s_es = 0 THEN 'und'
         |              WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
         |              WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
         |              WHEN s_fr >= s_es THEN 'fr'
         |              ELSE 'es' END AS predicted_lang
         |       FROM lsc),
         |tk AS (SELECT doc_id, CAST(len(string_split(t, ' ')) AS BIGINT) AS ws
         |       FROM n),
         |pd AS (SELECT d.source, d.doc_id, tk.ws, q.is_quality,
         |              lg.predicted_lang
         |       FROM documents d JOIN tk ON d.doc_id = tk.doc_id
         |            JOIN q ON d.doc_id = q.doc_id
         |            JOIN lg ON d.doc_id = lg.doc_id),
         |base AS (SELECT source, COUNT(*) AS n_docs,
         |                CAST(SUM(ws) AS BIGINT) AS total_tokens,
         |                CAST(SUM(is_quality) AS BIGINT) AS nq
         |         FROM pd GROUP BY 1),
         |lcnt AS (SELECT source, predicted_lang, COUNT(*) AS c
         |         FROM pd GROUP BY 1, 2),
         |ltop AS (SELECT source, predicted_lang AS top_lang, c AS top_n
         |         FROM (SELECT *, row_number() OVER (PARTITION BY source
         |                 ORDER BY c DESC, predicted_lang) AS rn FROM lcnt) z
         |         WHERE rn = 1),
         |dh AS (SELECT d.source, md5(n.t) AS h
         |       FROM documents d JOIN n ON d.doc_id = n.doc_id),
         |dg AS (SELECT source, h, COUNT(*) AS cnt FROM dh GROUP BY 1, 2),
         |dup AS (SELECT source,
         |          CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
         |            AS n_dup
         |        FROM dg GROUP BY 1)
         |SELECT b.source, CAST(b.n_docs AS BIGINT) AS n_docs, b.total_tokens,
         |       b.total_tokens * 1000000 // b.n_docs AS tokens_per_doc_micro,
         |       b.nq * 1000000 // b.n_docs AS quality_ppm,
         |       dup.n_dup * 1000000 // b.n_docs AS dup_ppm,
         |       ltop.top_lang,
         |       ltop.top_n * 1000000 // b.n_docs AS top_lang_ppm
         |FROM base b JOIN ltop ON b.source = ltop.source
         |     JOIN dup ON b.source = dup.source
         |ORDER BY b.source""".stripMargin,

    // Token-budget greedy selection: exclusive running token total over
    // the (score desc, doc_id) order, kept while within half the
    // corpus's tokens; per-(source, kept) rollup.
    "q240_token_budget" ->
      s"""WITH $nCte,
         |$tokCte,
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              COUNT(*) FILTER (w IN ('the','a','of','and','to','in'))
         |                AS n_stop
         |       FROM tok GROUP BY doc_id),
         |sc AS (SELECT d.doc_id, d.source,
         |         CAST(st.n_tokens AS BIGINT) AS n_tokens,
         |         st.n_stop * 1000000 // greatest(st.n_tokens, 1) AS score_ppm
         |       FROM st JOIN documents d USING (doc_id)),
         |pf AS (SELECT *, COALESCE(SUM(n_tokens) OVER (
         |           ORDER BY score_ppm DESC, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |         AS prefix_tokens
         |       FROM sc),
         |bu AS (SELECT SUM(n_tokens) // 2 AS budget FROM sc),
         |kp AS (SELECT pf.*, bu.budget,
         |         CAST(CASE WHEN pf.prefix_tokens + pf.n_tokens <= bu.budget
         |              THEN 1 ELSE 0 END AS INT) AS kept
         |       FROM pf CROSS JOIN bu)
         |SELECT source, kept, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
         |       CAST(MIN(score_ppm) AS BIGINT) AS min_score_ppm,
         |       CAST(MAX(score_ppm) AS BIGINT) AS max_score_ppm,
         |       CAST(MAX(budget) AS BIGINT) AS budget_tokens
         |FROM kp GROUP BY source, kept
         |ORDER BY source, kept""".stripMargin,

    // Neyman allocation: per-source (N, Sx, Sxx) exact, sigma via one
    // sqrt of identical integers, floor-division allocations clamped
    // to the stratum size; proportional allocation for contrast.
    "q255_neyman_alloc" ->
      s"""WITH $nCte,
         |tk AS (SELECT d.source,
         |         CAST(len(string_split(n.t, ' ')) AS BIGINT) AS x
         |       FROM documents d JOIN n USING (doc_id)),
         |st AS (SELECT source, COUNT(*) AS nh,
         |         CAST(SUM(x) AS BIGINT) AS sx,
         |         CAST(SUM(x*x) AS BIGINT) AS sxx
         |       FROM tk GROUP BY source),
         |s2 AS (SELECT *, nh * sxx - sx * sx AS s2num FROM st),
         |s3 AS (SELECT *, CAST(round(sqrt(CAST(s2num AS DOUBLE)) / nh * 1e6, 0)
         |         AS BIGINT) AS sigma_e6 FROM s2),
         |s4 AS (SELECT *, nh * sigma_e6 AS wh FROM s3),
         |tt AS (SELECT CAST(SUM(nh) AS BIGINT) AS ntot,
         |         CAST(SUM(wh) AS HUGEINT) AS wtot FROM s4),
         |f AS (SELECT s4.*, tt.ntot, tt.wtot,
         |        ntot * 100000 // 1000000 AS budget
         |      FROM s4 CROSS JOIN tt)
         |SELECT source, CAST(nh AS BIGINT) AS n_docs, sigma_e6,
         |       CAST(CAST(wh AS HUGEINT) * 1000000 // wtot AS BIGINT)
         |         AS weight_ppm,
         |       CAST(least(CAST(nh AS HUGEINT),
         |            CAST(budget AS HUGEINT) * wh // wtot) AS BIGINT)
         |         AS neyman_n,
         |       CAST(least(CAST(nh AS HUGEINT),
         |            CAST(budget AS HUGEINT) * nh // ntot) AS BIGINT)
         |         AS proportional_n,
         |       CAST(budget AS BIGINT) AS budget_n
         |FROM f ORDER BY source""".stripMargin,

    // Capped budget selection: q240's global positional prefix PLUS a
    // per-source positional prefix, kept iff both fit.
    "q261_capped_budget" ->
      s"""WITH $nCte,
         |$tokCte,
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              COUNT(*) FILTER (w IN ('the','a','of','and','to','in'))
         |                AS n_stop
         |       FROM tok GROUP BY doc_id),
         |sc AS (SELECT d.doc_id, d.source,
         |         CAST(st.n_tokens AS BIGINT) AS n_tokens,
         |         st.n_stop * 1000000 // greatest(st.n_tokens, 1) AS score_ppm
         |       FROM st JOIN documents d USING (doc_id)),
         |gp AS (SELECT *, COALESCE(SUM(n_tokens) OVER (
         |           ORDER BY score_ppm DESC, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |         AS g_prefix
         |       FROM sc),
         |sp AS (SELECT *, COALESCE(SUM(n_tokens) OVER (
         |           PARTITION BY source ORDER BY score_ppm DESC, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |         AS s_prefix
         |       FROM gp),
         |bu AS (SELECT SUM(n_tokens) * 500000 // 1000000 AS budget FROM sc),
         |cp AS (SELECT source, SUM(n_tokens) * 700000 // 1000000 AS src_cap
         |       FROM sc GROUP BY source),
         |kp AS (SELECT sp.*, bu.budget, cp.src_cap,
         |         CAST(CASE WHEN sp.g_prefix + sp.n_tokens <= bu.budget
         |                    AND sp.s_prefix + sp.n_tokens <= cp.src_cap
         |              THEN 1 ELSE 0 END AS INT) AS kept
         |       FROM sp CROSS JOIN bu JOIN cp USING (source))
         |SELECT source, kept, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
         |       CAST(MAX(budget) AS BIGINT) AS budget_tokens,
         |       CAST(MAX(src_cap) AS BIGINT) AS src_cap_tokens
         |FROM kp GROUP BY source, kept
         |ORDER BY source, kept""".stripMargin,
    // Efraimidis-Spirakis weighted reservoir: hash-uniform u in (0,1],
    // ONE ln() per row quantized to integer micro-nats, priority =
    // lnu_e6 / weight as identical doubles on both engines, top-100 by
    // (priority DESC, doc_id).
    "q296_weighted_reservoir" ->
      """WITH w AS (SELECT doc_id, source,
        |             GREATEST(CAST(n_chars AS BIGINT), 1) AS weight,
        |             (doc_id % 2147483647) * 48271 + 11 AS hraw
        |           FROM documents),
        |p AS (SELECT doc_id, source, weight,
        |        CAST(ROUND(ln(CAST(hraw % 2147483647 + 1 AS DOUBLE)
        |          / 2147483648.0) * 1000000, 0) AS BIGINT) AS lnu_e6
        |      FROM w),
        |r AS (SELECT doc_id, source, weight, lnu_e6,
        |        CAST(lnu_e6 AS DOUBLE) / weight AS priority,
        |        row_number() OVER (
        |          ORDER BY CAST(lnu_e6 AS DOUBLE) / weight DESC, doc_id)
        |          AS rnk
        |      FROM p)
        |SELECT CAST(rnk AS INT) AS rank, doc_id, source, weight,
        |       CAST(ROUND(CAST(lnu_e6 AS DOUBLE) / weight * 1000, 0)
        |         AS BIGINT) AS prio_milli
        |FROM r WHERE rnk <= 100
        |ORDER BY rank""".stripMargin,
    // Leave-one-source-out OLS valuation: exact integer sufficient
    // statistics, ablation by subtraction, HUGEINT cross-products, one
    // double division per coefficient quantized micro/ppm; the __all__
    // row is the un-ablated fit (delta 0).
    // Sorted-batching padding waste: global rank by (length, id) for the
    // curriculum, by the affine-mod hash for the shuffled baseline
    // (mirrors the PrefixSum two-pass rank exactly — any contiguous
    // split yields the same rank), batch = rk // size, per-(strategy,
    // size) slot/total/waste rollup in exact floor ppm.
    "q308_sorted_batching" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id,
         |         CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens
         |       FROM n),
         |sr AS (SELECT 'sorted' AS strategy, n_tokens,
         |         row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS rk
         |       FROM tk),
         |hr AS (SELECT 'hash_shuffled' AS strategy, n_tokens,
         |         row_number() OVER (
         |           ORDER BY (doc_id % 2147483647 * 48271 + 11) % 2147483647,
         |             doc_id) - 1 AS rk
         |       FROM tk),
         |u AS (SELECT * FROM sr UNION ALL SELECT * FROM hr),
         |bs AS (SELECT unnest([16, 64, 256]) AS batch_size),
         |ba AS (SELECT strategy, batch_size, rk // batch_size AS batch,
         |         COUNT(*) AS nb, MAX(n_tokens) AS mx,
         |         SUM(n_tokens) AS tt
         |       FROM u CROSS JOIN bs GROUP BY 1, 2, 3)
         |SELECT strategy, CAST(batch_size AS INT) AS batch_size,
         |       CAST(COUNT(*) AS BIGINT) AS n_batches,
         |       CAST(SUM(nb) AS BIGINT) AS n_docs,
         |       CAST(SUM(mx*nb) AS BIGINT) AS slot_tokens,
         |       CAST(SUM(tt) AS BIGINT) AS total_tokens,
         |       CAST(CASE WHEN SUM(mx*nb) = 0 THEN 0
         |         ELSE (SUM(mx*nb) - SUM(tt)) * 1000000 // SUM(mx*nb) END
         |         AS BIGINT) AS waste_ppm
         |FROM ba GROUP BY 1, 2
         |ORDER BY strategy, batch_size""".stripMargin,

    // Multiplicative-weights domain reweighting: the q181 LM chain
    // verbatim (per-doc floored NLL), source rollup, linearized EG
    // factor 1e6 + excess clamped >= 1, renormalized floor ppm; the
    // normalizer product runs in HUGEINT (raw*1e6 can exceed int64).
    "q309_domain_reweight" ->
      s"""WITH $nCte,
         |$mwBaseCtes,
         |rt AS (SELECT SUM(raw) AS rt FROM r2)
         |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
         |       CAST(nb AS BIGINT) AS n_bigrams,
         |       CAST(share_ppm AS BIGINT) AS share_ppm,
         |       CAST(nll_micro AS BIGINT) AS nll_micro,
         |       CAST(excess_micro AS BIGINT) AS excess_micro,
         |       CAST(factor_micro AS BIGINT) AS factor_micro,
         |       CAST(CASE WHEN rt.rt = 0 THEN 0
         |         ELSE CAST(raw AS HUGEINT) * 1000000 // rt.rt END
         |         AS BIGINT) AS new_share_ppm
         |FROM r2 CROSS JOIN rt
         |ORDER BY source""".stripMargin,

    "q311_doremi_trajectory" -> mwTrajectorySql,
    "q318_doremi_adaptive" -> mwAdaptiveSql,

    "q297_source_ablation" ->
      """WITH n2 AS (SELECT source,
        |              lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |            FROM documents),
        |xy AS (SELECT source,
        |         CAST(len(string_split(t, ' ')) AS BIGINT) AS x,
        |         CAST(len(list_distinct(string_split(t, ' '))) AS BIGINT) AS y
        |       FROM n2),
        |per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |          CAST(SUM(x*x) AS BIGINT) AS sxx,
        |          CAST(SUM(x*y) AS BIGINT) AS sxy,
        |          CAST(SUM(y*y) AS BIGINT) AS syy
        |        FROM xy GROUP BY source),
        |g AS (SELECT CAST(SUM(n) AS BIGINT) AS gn,
        |        CAST(SUM(sx) AS BIGINT) AS gsx, CAST(SUM(sy) AS BIGINT) AS gsy,
        |        CAST(SUM(sxx) AS BIGINT) AS gsxx,
        |        CAST(SUM(sxy) AS BIGINT) AS gsxy,
        |        CAST(SUM(syy) AS BIGINT) AS gsyy FROM per),
        |rws AS (SELECT source, gn - n AS n, gsx - sx AS sx, gsy - sy AS sy,
        |          gsxx - sxx AS sxx, gsxy - sxy AS sxy, gsyy - syy AS syy
        |        FROM per CROSS JOIN g
        |        UNION ALL
        |        SELECT '__all__', gn, gsx, gsy, gsxx, gsxy, gsyy FROM g),
        |m AS (SELECT source, n,
        |        CAST(n AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy AS num,
        |        CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx AS den,
        |        CAST(n AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy AS sst,
        |        CAST(sy AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sxy AS numa
        |      FROM rws),
        |met AS (SELECT source, n,
        |    CASE WHEN den = 0 THEN 0
        |      ELSE CAST(ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
        |        * 1000000, 0) AS BIGINT) END AS beta_micro,
        |    CASE WHEN den = 0 THEN 0
        |      ELSE CAST(ROUND(CAST(numa AS DOUBLE) / CAST(den AS DOUBLE)
        |        * 1000000, 0) AS BIGINT) END AS alpha_micro,
        |    CASE WHEN den = 0 OR sst = 0 THEN 0
        |      ELSE CAST(ROUND(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
        |        / (CAST(den AS DOUBLE) * CAST(sst AS DOUBLE)) * 1000000, 0)
        |        AS BIGINT) END AS r2_ppm
        |  FROM m),
        |gb AS (SELECT beta_micro AS gbeta FROM met WHERE source = '__all__')
        |SELECT source, CAST(n AS BIGINT) AS n_docs_wo, beta_micro,
        |       alpha_micro, beta_micro - gb.gbeta AS delta_beta_micro,
        |       r2_ppm
        |FROM met CROSS JOIN gb
        |ORDER BY source""".stripMargin,
    // Grouped log-bucket sketch over per-source document byte lengths:
    // the SAME value-independent grid as q314 (mergeable by addition),
    // per-group cumulative counts over the bucket spine. Mirrors
    // QuantileSketch.groupedLogQuantiles (subBits=5) exactly.
    "q315_source_len_sketch" ->
      s"""WITH v AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v
         |           FROM documents WHERE n_chars IS NOT NULL),
         |d AS (SELECT g, v, GREATEST(length(bin(v)) - 1 - 5, 0) AS shift
         |      FROM v),
         |d2 AS (SELECT g, v, shift,
         |         v // (CAST(1 AS BIGINT) << CAST(shift AS INT)) AS q
         |       FROM d),
         |cells AS (SELECT g, shift * 64 + q AS bucket, shift, q,
         |            COUNT(*) AS cnt
         |          FROM d2 GROUP BY 1, 2, 3, 4),
         |cum AS (SELECT g, bucket, shift, q, cnt,
         |          COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY bucket
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |            AS cum_excl,
         |          SUM(cnt) OVER (PARTITION BY g) AS n
         |        FROM cells),
         |probs AS (SELECT CAST(unnest([250000, 500000, 900000, 990000,
         |            999000]) AS BIGINT) AS prob_ppm),
         |j AS (SELECT g, prob_ppm, bucket, shift, q, cnt, cum_excl, n,
         |        (prob_ppm * (n - 1)) // 1000000 AS rk
         |      FROM cum CROSS JOIN probs),
         |hit AS (SELECT *,
         |          q * (CAST(1 AS BIGINT) << CAST(shift AS INT)) AS bucket_lo,
         |          (q + 1) * (CAST(1 AS BIGINT) << CAST(shift AS INT)) - 1
         |            AS bucket_hi
         |        FROM j WHERE cum_excl <= rk AND rk < cum_excl + cnt)
         |SELECT g AS source, prob_ppm, CAST(bucket_lo AS BIGINT) AS bucket_lo,
         |       CAST(bucket_hi AS BIGINT) AS bucket_hi,
         |       CAST(cnt AS BIGINT) AS bucket_count, CAST(n AS BIGINT) AS n,
         |       CAST(bucket_lo + ((rk - cum_excl) * (bucket_hi - bucket_lo))
         |            // cnt AS BIGINT) AS estimate
         |FROM hit ORDER BY source, prob_ppm""".stripMargin,
  )
}
