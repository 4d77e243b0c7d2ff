package graft.oracle

import graft.oracle.OracleDialect._

/** DuckDB oracle SQL — text tier
  * (38 queries). Values are verbatim from SparkEntry.scala
  * (round-11 mechanical split); SparkEntry.oracleSql concatenates the
  * domain maps, and QueriesSpec pins key-set equality (both directions) with the
  * query registry. */
object OracleText {
  /** q284 generators — the unigram-LM Viterbi DP unrolled (mirrors
    * UnigramLm.viterbi): per position one MATERIALIZED cell CTE whose
    * winner is row_number over (cost, np, piece). MATERIALIZED matters:
    * DuckDB 1.0 inlines multiply-referenced CTEs, and an unmaterialized
    * 12-step chain re-evaluates its upstream per reference. */
  private def dpCtes(tag: String, vp: String, maxWordLen: Int,
                     maxPieceLen: Int): String = {
    val base =
      s"""dp${tag}0 AS MATERIALIZED (
         |  SELECT w, len, CAST(0 AS BIGINT) AS cost, 0 AS np,
         |         '' AS piece, 0 AS prev FROM wl)""".stripMargin
    val steps = (1 to maxWordLen).map { p =>
      val cands = (1 to math.min(maxPieceLen, p)).map { l =>
        s"""SELECT d.w, d.len, d.cost + v.lp AS cost, d.np + 1 AS np,
           |       v.piece, ${p - l} AS prev
           |FROM dp$tag${p - l} d JOIN $vp v
           |  ON v.piece = substr(d.w, ${p - l + 1}, $l)
           |WHERE d.len >= $p""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""dp$tag$p AS MATERIALIZED (
         |  SELECT w, len, cost, np, piece, prev FROM (
         |    SELECT *, row_number() OVER (PARTITION BY w
         |      ORDER BY cost, np, piece) AS rk
         |    FROM ($cands) c) z WHERE rk = 1)""".stripMargin
    }
    val all = (1 to maxWordLen)
      .map(p => s"SELECT $p AS pos, * FROM dp$tag$p")
      .mkString("\nUNION ALL\n")
    (base +: steps).mkString(",\n") +
      s",\ndpall$tag AS MATERIALIZED (\n$all)"
  }

  /** Backward path walk over the staged DP table: bt1 = each word's
    * final cell, bt{s} follows `prev`; `uses$tag` = every (w, piece)
    * emission. */
  private def btCtes(tag: String, maxWordLen: Int): String = {
    val first =
      s"""bt${tag}1 AS MATERIALIZED (
         |  SELECT w, piece, prev FROM dpall$tag WHERE pos = len)""".stripMargin
    val steps = (2 to maxWordLen).map { s =>
      s"""bt$tag$s AS MATERIALIZED (
         |  SELECT d.w, d.piece, d.prev
         |  FROM bt$tag${s - 1} b JOIN dpall$tag d
         |    ON d.w = b.w AND d.pos = b.prev
         |  WHERE b.prev > 0)""".stripMargin
    }
    val all = (1 to maxWordLen)
      .map(s => s"SELECT w, piece FROM bt$tag$s").mkString("\nUNION ALL\n")
    (first +: steps).mkString(",\n") + s",\nuses$tag AS (\n$all)"
  }

  /** The unigram-LM training CHAIN (vocab → seed → E-step → prune →
    * E-step), ending at `npf` = (w, np) — the per-word piece count
    * under the pruned vocabulary. Needs `tok` in scope; shared by the
    * full q284 readout and the q317 fertility matrix (which runs it at
    * the equal-budget keepMulti). */
  private def unigramChainCtes(seedMulti: Int, keepMulti: Int,
                               maxWordLen: Int, maxPieceLen: Int): String = {
    val occLegs = (1 to maxPieceLen).map { l =>
      s"""SELECT substr(w, CAST(g AS INT), $l) AS piece, freq
         |FROM (SELECT w, freq, unnest(range(1, length(w) - ${l - 2})) AS g
         |      FROM vw) z$l""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""vw AS MATERIALIZED (
       |  SELECT w, COUNT(*) AS freq FROM tok
       |  WHERE regexp_matches(w, '^[a-z]+$$') AND length(w) <= $maxWordLen
       |  GROUP BY w),
       |wl AS MATERIALIZED (SELECT w, CAST(length(w) AS INT) AS len FROM vw),
       |occ AS MATERIALIZED (
       |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS c0
       |  FROM ($occLegs) zz GROUP BY piece),
       |mu AS (SELECT piece, c0 FROM occ WHERE length(piece) >= 2
       |       ORDER BY c0 DESC, piece LIMIT $seedMulti),
       |v0 AS MATERIALIZED (
       |  SELECT piece, c0 FROM occ WHERE length(piece) = 1
       |  UNION ALL SELECT piece, c0 FROM mu),
       |t0 AS (SELECT CAST(SUM(c0) AS BIGINT) AS tt, COUNT(*) AS vv FROM v0),
       |vp0 AS MATERIALIZED (
       |  SELECT piece, CAST(ROUND(ln((tt + vv) / (c0 + 1.0)) * 1000000, 0)
       |    AS BIGINT) AS lp
       |  FROM v0 CROSS JOIN t0),
       |${dpCtes("a", "vp0", maxWordLen, maxPieceLen)},
       |${btCtes("a", maxWordLen)},
       |u1 AS MATERIALIZED (
       |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS u1
       |  FROM usesa JOIN vw USING (w) GROUP BY piece),
       |km AS (SELECT v0.piece, COALESCE(u1.u1, 0) AS u1
       |       FROM v0 LEFT JOIN u1 USING (piece)
       |       WHERE length(v0.piece) >= 2 AND COALESCE(u1.u1, 0) >= 1
       |       ORDER BY u1 DESC, piece LIMIT $keepMulti),
       |v1 AS MATERIALIZED (
       |  SELECT v0.piece, COALESCE(u1.u1, 0) AS u1
       |  FROM v0 LEFT JOIN u1 USING (piece) WHERE length(v0.piece) = 1
       |  UNION ALL SELECT piece, u1 FROM km),
       |t1 AS (SELECT CAST(SUM(u1) AS BIGINT) AS tt, COUNT(*) AS vv FROM v1),
       |vp1 AS MATERIALIZED (
       |  SELECT piece, CAST(ROUND(ln((tt + vv) / (u1 + 1.0)) * 1000000, 0)
       |    AS BIGINT) AS lp
       |  FROM v1 CROSS JOIN t1),
       |${dpCtes("b", "vp1", maxWordLen, maxPieceLen)},
       |npf AS MATERIALIZED (SELECT w, np FROM dpallb WHERE pos = len)""".stripMargin
  }

  /** The full q284 SQL: seed → E-step → prune → E-step → per-source
    * application, every constant shared with UnigramLm's defaults. */
  private def unigramSql(seedMulti: Int, keepMulti: Int, maxWordLen: Int,
                         maxPieceLen: Int): String =
    s"""WITH $nCte, $tokCte,
       |${unigramChainCtes(seedMulti, keepMulti, maxWordLen, maxPieceLen)},
       |va AS (SELECT COUNT(*) AS vocab_initial FROM v0),
       |vb AS (SELECT COUNT(*) AS vocab_final FROM v1),
       |ap AS (SELECT d.source, t.w FROM tok t
       |       JOIN documents d USING (doc_id) WHERE t.w <> ''),
       |agg AS (SELECT source, COUNT(*) AS n_words,
       |          SUM(CASE WHEN npf.np IS NOT NULL THEN 1 ELSE 0 END)
       |            AS n_seg_words,
       |          SUM(COALESCE(npf.np, 1)) AS total_pieces,
       |          SUM(length(ap.w)) AS total_chars
       |        FROM ap LEFT JOIN npf ON npf.w = ap.w
       |        GROUP BY source)
       |SELECT source, CAST(n_words AS BIGINT) AS n_words,
       |       CAST(n_seg_words AS BIGINT) AS n_seg_words,
       |       CAST(total_pieces AS BIGINT) AS total_pieces,
       |       CAST(total_chars AS BIGINT) AS total_chars,
       |       CAST(total_pieces * 1000000 // n_words AS BIGINT)
       |         AS pieces_per_word_micro,
       |       CAST(vocab_initial AS BIGINT) AS vocab_initial,
       |       CAST(vocab_final AS BIGINT) AS vocab_final
       |FROM agg CROSS JOIN va CROSS JOIN vb
       |ORDER BY source""".stripMargin

  private[graft] val sql: Map[String, String] = Map(
    "q284_unigram_lm" -> unigramSql(48, 32, 12, 4),
    // Tokenizer fertility matrix: the THREE lineages (BPE count-argmax,
    // unigram-LM likelihood prune, WordPiece likelihood-ratio) trained
    // in ONE statement at the equal budget of 6 learned multi-character
    // units each, applied to the same per-language token stream —
    // tokens/word and bytes/token per (lineage, lang). WP rounds carry
    // tag "t" so both merge chains share the bvocab/s0 base without
    // CTE-name collision.
    "q317_tokenizer_fertility" -> {
      s"""WITH $trainerBaseCtes,
         |$tokCte,
         |${unigramChainCtes(48, 6, 12, 4)},
         |${bpeRoundCtes(6, "")},
         |${wpRoundCtes(6, "t")},
         |segb AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS np FROM s6 GROUP BY w),
         |segw AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS np FROM st6 GROUP BY w),
         |tw AS (SELECT d.lang, t.w FROM tok t
         |       JOIN documents d USING (doc_id) WHERE t.w <> ''),
         |lin AS (
         |  SELECT 'bpe' AS lineage, lang, w, segb.np
         |  FROM tw LEFT JOIN segb USING (w)
         |  UNION ALL
         |  SELECT 'unigram' AS lineage, lang, w, CAST(npf.np AS BIGINT) AS np
         |  FROM tw LEFT JOIN npf USING (w)
         |  UNION ALL
         |  SELECT 'wordpiece' AS lineage, lang, w, segw.np
         |  FROM tw LEFT JOIN segw USING (w)),
         |agg AS (SELECT lineage, lang, COUNT(*) AS n_words,
         |          SUM(CASE WHEN np IS NOT NULL THEN 1 ELSE 0 END)
         |            AS covered_words,
         |          SUM(COALESCE(np, 1)) AS total_pieces,
         |          SUM(length(w)) AS total_chars
         |        FROM lin GROUP BY 1, 2)
         |SELECT lineage, lang, CAST(n_words AS BIGINT) AS n_words,
         |       CAST(covered_words AS BIGINT) AS covered_words,
         |       CAST(total_pieces AS BIGINT) AS total_pieces,
         |       CAST(total_chars AS BIGINT) AS total_chars,
         |       CAST(total_pieces * 1000000 // n_words AS BIGINT)
         |         AS tokens_per_word_micro,
         |       CAST(total_chars * 1000000 // total_pieces AS BIGINT)
         |         AS bytes_per_token_micro
         |FROM agg ORDER BY lineage, lang""".stripMargin
    },
    "q28_token_stats" ->
      s"""WITH $nCte
         |SELECT doc_id,
         |       len(string_split(t, ' ')) AS n_ws_tokens,
         |       len(regexp_extract_all(t, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS n_bpe_tokens,
         |       length(t) AS n_chars_norm
         |FROM n
         |ORDER BY doc_id""".stripMargin,
    "q29_quality_score" ->
      s"""WITH $nCte,
         |$tokCte,
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens, SUM(length(w)) AS tok_chars,
         |              SUM(CASE WHEN w IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) AS n_stop
         |       FROM tok GROUP BY doc_id),
         |base AS (SELECT doc_id, length(t) AS n_chars,
         |                length(t) - length(regexp_replace(t, '[^a-z0-9 ]', '', 'g')) AS n_punct
         |         FROM n)
         |SELECT b.doc_id AS doc_id, st.n_tokens,
         |       ROUND(CAST(st.tok_chars AS DOUBLE)/st.n_tokens, 4) AS mean_tok_len,
         |       ROUND(CAST(b.n_punct AS DOUBLE)/b.n_chars, 4) AS punct_ratio,
         |       ROUND(CAST(st.n_stop AS DOUBLE)/st.n_tokens, 4) AS stop_ratio,
         |       CASE WHEN st.n_tokens BETWEEN 10 AND 1000
         |                 AND CAST(st.n_stop AS DOUBLE)/st.n_tokens >= 0.05
         |            THEN 1 ELSE 0 END AS is_quality
         |FROM base b JOIN st ON st.doc_id = b.doc_id
         |ORDER BY 1""".stripMargin,
    "q30_langid" ->
      s"""WITH $nCte,
         |$tokCte,
         |sc AS (SELECT doc_id,
         |        CAST(SUM(CASE WHEN w IN ('the','a','of','and') THEN 1 ELSE 0 END) AS BIGINT) AS s_en,
         |        CAST(SUM(CASE WHEN w IN ('der','und','die','ist') THEN 1 ELSE 0 END) AS BIGINT) AS s_de,
         |        CAST(SUM(CASE WHEN w IN ('le','et','les','une') THEN 1 ELSE 0 END) AS BIGINT) AS s_fr,
         |        CAST(SUM(CASE WHEN w IN ('el','y','los','las') THEN 1 ELSE 0 END) AS BIGINT) AS s_es
         |       FROM tok GROUP BY doc_id)
         |SELECT doc_id, s_en, s_de, s_fr, s_es,
         |  CASE WHEN s_en+s_de+s_fr+s_es = 0 THEN 'und'
         |       WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
         |       WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
         |       WHEN s_fr >= s_es THEN 'fr'
         |       ELSE 'es' END AS predicted_lang
         |FROM sc
         |ORDER BY doc_id""".stripMargin,
    "q31_fingerprint" ->
      s"""WITH $nCte,
         |$char8HashCte
         |SELECT doc_id,
         |       CAST(SUM(hv) % ${graft.ext.TextOps.HashP} AS BIGINT) AS fingerprint,
         |       COUNT(*) AS n_shingles
         |FROM h
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
    "q45_data_quality" ->
      """SELECT c_mktsegment,
        |       COUNT(*) AS n_total,
        |       CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_acctbal,
        |       CAST(SUM(CASE WHEN c_acctbal <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonpositive,
        |       CAST(SUM(CASE WHEN length(trim(c_name)) = 0 OR c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_blank_name,
        |       ROUND(CAST(SUM(CASE WHEN c_acctbal <= 0 THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*), 4) AS nonpositive_share
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q50_corpus_report" ->
      s"""WITH $nCte,
         |$tokCte,
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |        SUM(CASE WHEN w IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) AS n_stop,
         |        CAST(SUM(CASE WHEN w IN ('the','a','of','and') THEN 1 ELSE 0 END) AS BIGINT) AS s_en,
         |        CAST(SUM(CASE WHEN w IN ('der','und','die','ist') THEN 1 ELSE 0 END) AS BIGINT) AS s_de,
         |        CAST(SUM(CASE WHEN w IN ('le','et','les','une') THEN 1 ELSE 0 END) AS BIGINT) AS s_fr,
         |        CAST(SUM(CASE WHEN w IN ('el','y','los','las') THEN 1 ELSE 0 END) AS BIGINT) AS s_es
         |       FROM tok GROUP BY doc_id),
         |pd AS (SELECT doc_id, n_tokens,
         |        CASE WHEN n_tokens BETWEEN 10 AND 1000
         |                  AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.05
         |             THEN 1 ELSE 0 END AS is_quality,
         |        CASE WHEN s_en+s_de+s_fr+s_es = 0 THEN 'und'
         |             WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
         |             WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
         |             WHEN s_fr >= s_es THEN 'fr'
         |             ELSE 'es' END AS predicted_lang
         |       FROM st),
         |rep AS (SELECT MIN(doc_id) AS doc_id FROM n GROUP BY t)
         |SELECT pd.predicted_lang, pd.is_quality,
         |       COUNT(*) AS n_docs,
         |       CAST(SUM(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         |       ROUND(CAST(SUM(pd.n_tokens) AS DOUBLE)/COUNT(*), 4) AS avg_tokens
         |FROM pd LEFT JOIN rep r ON r.doc_id = pd.doc_id
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,
    // Token/bigram identity = the same full-length rolling hash the
    // kernel computes, so distinct/frequency semantics (collisions
    // included) are engine-identical.
    "q53_repetition" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n WHERE t <> ''),
         |th AS (SELECT doc_id, ${fullHash("w")} AS hv
         |       FROM (SELECT doc_id, unnest(toks) AS w FROM tk) z),
         |tc AS (SELECT doc_id, hv, COUNT(*) AS c FROM th GROUP BY 1, 2),
         |ts AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |              COUNT(*) AS n_distinct, MAX(c) AS top
         |       FROM tc GROUP BY 1),
         |bg AS (SELECT doc_id, toks[g] || ' ' || toks[g+1] AS sg
         |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS g FROM tk) z),
         |bh AS (SELECT doc_id, ${fullHash("sg")} AS hv FROM bg),
         |bs AS (SELECT doc_id, COUNT(*) AS n_bg, COUNT(DISTINCT hv) AS nd_bg
         |       FROM bh GROUP BY 1)
         |SELECT ts.doc_id, ts.n_tokens,
         |       ROUND(CAST(n_distinct AS DOUBLE)/n_tokens, 4) AS distinct_ratio,
         |       ROUND(CAST(top AS DOUBLE)/n_tokens, 4) AS top_token_frac,
         |       COALESCE(ROUND(1.0 - CAST(nd_bg AS DOUBLE)/n_bg, 4), 0.0)
         |         AS dup_bigram_frac,
         |       CASE WHEN ROUND(CAST(n_distinct AS DOUBLE)/n_tokens, 4) < 0.5
         |              OR ROUND(CAST(top AS DOUBLE)/n_tokens, 4) > 0.2
         |              OR COALESCE(ROUND(1.0 - CAST(nd_bg AS DOUBLE)/n_bg, 4), 0.0) > 0.5
         |            THEN 1 ELSE 0 END AS is_repetitive
         |FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
         |ORDER BY ts.doc_id""".stripMargin,
    // Augmentation (same expression as TextQueries.piiScrub) injects
    // doc_id-derived PII so the redaction regexes bite on every row;
    // counts are against the augmented original, replacements cascade
    // URL -> EMAIL -> PHONE.
    "q54_pii_scrub" ->
      s"""WITH $nCte,
         |a AS (SELECT doc_id,
         |        t || ' contact user' || CAST(doc_id AS VARCHAR)
         |          || '@mail.example.com or https://ex.org/d/'
         |          || CAST(doc_id AS VARCHAR)
         |          || '?ref=a call 010-1234-5678' AS t
         |      FROM n)
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(t, '${graft.ext.TextClean.EmailPattern}')) AS BIGINT) AS n_emails,
         |       CAST(len(regexp_extract_all(t, '${graft.ext.TextClean.UrlPattern}')) AS BIGINT) AS n_urls,
         |       CAST(len(regexp_extract_all(t, '${graft.ext.TextClean.PhonePattern}')) AS BIGINT) AS n_phones,
         |       regexp_replace(regexp_replace(regexp_replace(t,
         |         '${graft.ext.TextClean.UrlPattern}', '<URL>', 'g'),
         |         '${graft.ext.TextClean.EmailPattern}', '<EMAIL>', 'g'),
         |         '${graft.ext.TextClean.PhonePattern}', '<PHONE>', 'g') AS clean_text
         |FROM a
         |ORDER BY doc_id""".stripMargin,
    "q55_token_histogram" ->
      s"""WITH $nCte,
         |c AS (SELECT CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens FROM n)
         |SELECT n_tokens - (n_tokens % 16) AS bucket_lo,
         |       COUNT(*) AS n_docs,
         |       MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens
         |FROM c GROUP BY 1
         |ORDER BY bucket_lo""".stripMargin,
    "q56_corpus_quantiles" ->
      s"""WITH $nCte,
         |c AS (SELECT CAST(len(string_split(t, ' ')) AS BIGINT) AS n_tokens,
         |             CAST(length(t) AS BIGINT) AS n_chars
         |      FROM n),
         |q AS (SELECT quantile_cont(n_tokens, [0.25, 0.5, 0.75, 0.9, 0.99]) AS qt,
         |             quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.9, 0.99]) AS qc
         |      FROM c)
         |SELECT ROUND(qt[1], 4) AS tok_p25, ROUND(qt[2], 4) AS tok_p50,
         |       ROUND(qt[3], 4) AS tok_p75, ROUND(qt[4], 4) AS tok_p90,
         |       ROUND(qt[5], 4) AS tok_p99,
         |       ROUND(qc[1], 4) AS chr_p25, ROUND(qc[2], 4) AS chr_p50,
         |       ROUND(qc[3], 4) AS chr_p75, ROUND(qc[4], 4) AS chr_p90,
         |       ROUND(qc[5], 4) AS chr_p99
         |FROM q""".stripMargin,
    "q60_vocab_topk" ->
      s"""WITH $nCte,
         |$tokCte,
         |agg AS (SELECT w, COUNT(*) AS n_occurrences,
         |               COUNT(DISTINCT doc_id) AS n_docs
         |        FROM tok GROUP BY w),
         |rk AS (SELECT w, n_occurrences, n_docs,
         |              row_number() OVER (ORDER BY n_occurrences DESC, w) AS rnk
         |       FROM agg)
         |SELECT w, n_occurrences, n_docs, CAST(rnk AS INT) AS rank
         |FROM rk WHERE rnk <= 20
         |ORDER BY rank""".stripMargin,
    "q62_c4_filter" ->
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
         |r AS (SELECT *, CASE WHEN n_tokens < 50 THEN 'too_short'
         |                     WHEN ml < 4.2 OR ml > 4.8 THEN 'word_len'
         |                     WHEN lf > 0.06 THEN 'long_token_frac'
         |                     WHEN ns < 2 THEN 'no_stopwords'
         |                     ELSE 'kept' END AS reject_reason
         |      FROM m)
         |SELECT doc_id, n_tokens, ROUND(ml, 4) AS mean_tok_len,
         |       ROUND(lf, 4) AS long_frac, ns AS n_stopwords,
         |       CASE WHEN reject_reason = 'kept' THEN 1 ELSE 0 END AS keep,
         |       reject_reason
         |FROM r
         |ORDER BY doc_id""".stripMargin,
    "q185_quality_funnel" ->
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
         |r AS (SELECT doc_id, CASE WHEN n_tokens < 50 THEN 'too_short'
         |                     WHEN ml < 4.2 OR ml > 4.8 THEN 'word_len'
         |                     WHEN lf > 0.06 THEN 'long_token_frac'
         |                     WHEN ns < 2 THEN 'no_stopwords'
         |                     ELSE 'kept' END AS reject_reason
         |      FROM m),
         |g AS (SELECT d.source, r.reject_reason, COUNT(*) AS n_docs
         |      FROM r JOIN documents d ON r.doc_id = d.doc_id
         |      GROUP BY d.source, r.reject_reason)
         |SELECT source, reject_reason, n_docs,
         |       CAST((n_docs * 1000000) // SUM(n_docs) OVER (PARTITION BY source)
         |            AS BIGINT) AS share_ppm
         |FROM g ORDER BY source, reject_reason""".stripMargin,
    "q77_bpe_merge_pairs" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |bg AS (SELECT doc_id, toks[g] || ' ' || toks[g+1] AS pair
         |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS g FROM tk) z),
         |agg AS (SELECT pair, COUNT(*) AS n_occurrences,
         |               COUNT(DISTINCT doc_id) AS n_docs
         |        FROM bg GROUP BY pair),
         |rk AS (SELECT pair, n_occurrences, n_docs,
         |              CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, pair) AS INT)
         |                AS rank
         |       FROM agg)
         |SELECT pair, n_occurrences, n_docs, rank
         |FROM rk WHERE rank <= 20
         |ORDER BY rank""".stripMargin,
    "q78_quality_sample" ->
      s"""WITH $nCte,
         |$tokCte,
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              SUM(CASE WHEN w IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) AS n_stop
         |       FROM tok GROUP BY doc_id),
         |q AS (SELECT doc_id,
         |             CASE WHEN n_tokens BETWEEN 10 AND 1000
         |                       AND CAST(n_stop AS DOUBLE)/n_tokens >= 0.05
         |                  THEN 1 ELSE 0 END AS is_quality
         |      FROM st),
         |k AS (SELECT is_quality,
         |             CASE WHEN $bucketExpr < 20 + is_quality * 60 THEN 1 ELSE 0 END AS kept
         |      FROM q)
         |SELECT is_quality, COUNT(*) AS n_total,
         |       CAST(SUM(kept) AS BIGINT) AS n_kept,
         |       ROUND(CAST(SUM(kept) AS DOUBLE)/COUNT(*), 4) AS kept_rate
         |FROM k GROUP BY is_quality
         |ORDER BY is_quality""".stripMargin,
    // Winner set is all-integer (tf desc, term); the IDF weight is the
    // only float and is display-rounded. ln = natural log both sides.
    "q88_tfidf_top_terms" ->
      """WITH ns AS (
        |  SELECT doc_id, source,
        |         lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |  FROM documents),
        |toks AS (SELECT doc_id, source, unnest(string_split(t, ' ')) AS w
        |         FROM ns),
        |tot AS (SELECT COUNT(DISTINCT doc_id) AS n_total FROM documents),
        |dft AS (SELECT w, COUNT(DISTINCT doc_id) AS n_docs FROM toks GROUP BY w),
        |tf AS (SELECT source, w, COUNT(*) AS tf FROM toks GROUP BY source, w),
        |j AS (
        |  SELECT tf.source, tf.w, tf.tf, dft.n_docs,
        |         ROUND(tf.tf * ln(CAST(n_total AS DOUBLE)/n_docs), 4) AS tfidf,
        |         row_number() OVER (PARTITION BY tf.source
        |           ORDER BY tf.tf DESC, tf.w) AS rnk
        |  FROM tf JOIN dft USING (w) CROSS JOIN tot)
        |SELECT source, CAST(rnk AS INT) AS rank, w, tf, n_docs, tfidf
        |FROM j WHERE rnk <= 10
        |ORDER BY source, rank""".stripMargin,
    // Integer token counts; cumulative sums compared at the same
    // (count desc, word) total order on both engines.
    "q96_vocab_coverage" ->
      s"""WITH $nCte,
         |tok AS (SELECT unnest(string_split(t, ' ')) AS w FROM n),
         |freq AS (SELECT w, COUNT(*) AS n FROM tok GROUP BY w),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_tokens,
         |               COUNT(*) AS n_vocab FROM freq),
         |top AS (SELECT w, n,
         |               row_number() OVER (ORDER BY n DESC, w) AS rank,
         |               CAST(SUM(n) OVER (ORDER BY n DESC, w
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |                 AS BIGINT) AS cum
         |        FROM freq),
         |cuts AS (SELECT * FROM (VALUES (5),(10),(20),(50)) AS c(cutoff)),
         |j AS (SELECT cutoff, CAST(MAX(rank) AS INT) AS n_vocab_used,
         |             MAX(cum) AS covered_tokens
         |      FROM cuts JOIN top ON top.rank <= cuts.cutoff
         |      GROUP BY cutoff)
         |SELECT cutoff, n_vocab_used, covered_tokens, n_vocab, total_tokens,
         |       ROUND(CAST(covered_tokens AS DOUBLE)/total_tokens, 6) AS coverage
         |FROM j CROSS JOIN tot
         |ORDER BY cutoff""".stripMargin,
    // Marker scoring identical to q30; shares divide exact counts
    // fixed-point within each source slice.
    "q111_lang_source_mix" ->
      s"""WITH nn AS (SELECT source, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
         |            FROM documents),
         |sc AS (SELECT source,
         |        CAST(len(list_filter(string_split(t, ' '), w -> w IN ('the','a','of','and'))) AS BIGINT) AS s_en,
         |        CAST(len(list_filter(string_split(t, ' '), w -> w IN ('der','und','die','ist'))) AS BIGINT) AS s_de,
         |        CAST(len(list_filter(string_split(t, ' '), w -> w IN ('le','et','les','une'))) AS BIGINT) AS s_fr,
         |        CAST(len(list_filter(string_split(t, ' '), w -> w IN ('el','y','los','las'))) AS BIGINT) AS s_es
         |       FROM nn),
         |pr AS (SELECT source,
         |        CASE WHEN s_en+s_de+s_fr+s_es = 0 THEN 'und'
         |             WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
         |             WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
         |             WHEN s_fr >= s_es THEN 'fr'
         |             ELSE 'es' END AS predicted_lang
         |       FROM sc),
         |cnt AS (SELECT source, predicted_lang, COUNT(*) AS n_docs
         |        FROM pr GROUP BY 1, 2),
         |tots AS (SELECT source, CAST(SUM(n_docs) AS BIGINT) AS tot
         |         FROM cnt GROUP BY source)
         |SELECT c.source, c.predicted_lang, c.n_docs,
         |       CAST((c.n_docs * 1000000) // t.tot AS DOUBLE)/1000000.0 AS share
         |FROM cnt c JOIN tots t ON c.source = t.source
         |ORDER BY c.source, c.predicted_lang""".stripMargin,
    // One scored projection (marker counts + both tokenizations), then a
    // language-keyed aggregation of exact integers; fertility is
    // fixed-point floor division.
    "q112_token_fertility" ->
      s"""WITH $nCte,
         |sc AS (SELECT doc_id,
         |        CAST(len(string_split(t, ' ')) AS BIGINT) AS n_ws,
         |        CAST(len(regexp_extract_all(t, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS n_bpe,
         |        CAST(len(list_filter(string_split(t, ' '), w -> w IN ('the','a','of','and'))) AS BIGINT) AS s_en,
         |        CAST(len(list_filter(string_split(t, ' '), w -> w IN ('der','und','die','ist'))) AS BIGINT) AS s_de,
         |        CAST(len(list_filter(string_split(t, ' '), w -> w IN ('le','et','les','une'))) AS BIGINT) AS s_fr,
         |        CAST(len(list_filter(string_split(t, ' '), w -> w IN ('el','y','los','las'))) AS BIGINT) AS s_es
         |       FROM n),
         |pr AS (SELECT n_ws, n_bpe,
         |        CASE WHEN s_en+s_de+s_fr+s_es = 0 THEN 'und'
         |             WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
         |             WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
         |             WHEN s_fr >= s_es THEN 'fr'
         |             ELSE 'es' END AS predicted_lang
         |       FROM sc)
         |SELECT predicted_lang, COUNT(*) AS n_docs,
         |       CAST(SUM(n_ws) AS BIGINT) AS ws_tokens,
         |       CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens,
         |       CAST((CAST(SUM(n_bpe) AS BIGINT) * 10000) // CAST(SUM(n_ws) AS BIGINT)
         |            AS DOUBLE)/10000.0 AS fertility
         |FROM pr
         |GROUP BY predicted_lang
         |ORDER BY predicted_lang""".stripMargin,
    // The sketch replayed relationally: same 31-Horner token hash, same
    // LCG row constants, 4×512 integer bucket sums, estimate = MIN over
    // the token's buckets. All integers — the oracle builds the
    // IDENTICAL sketch.
    "q117_cms_heavy_hitters" ->
      s"""WITH $nCte,
         |$tokCte,
         |vocab AS (SELECT w, COUNT(*) AS n FROM tok WHERE w <> '' GROUP BY w),
         |hv AS (SELECT w, n, ${fullHash("w")} AS h FROM vocab),
         |bk AS (SELECT w, n, t.i,
         |         ((CASE t.i WHEN 0 THEN 1103515245*h + 12345
         |                    WHEN 1 THEN 69069*h + 362437
         |                    WHEN 2 THEN 1664525*h + 1013904223
         |                    ELSE 22695477*h + 1 END)
         |          % ${graft.ext.TextOps.HashP}) % 512 AS bucket
         |       FROM hv CROSS JOIN (VALUES (0),(1),(2),(3)) t(i)),
         |cms AS (SELECT i, bucket, CAST(SUM(n) AS BIGINT) AS bsum
         |        FROM bk GROUP BY 1, 2),
         |top AS (SELECT w, n,
         |          CAST(row_number() OVER (ORDER BY n DESC, w) AS INT) AS rank
         |        FROM vocab ORDER BY n DESC, w LIMIT 10)
         |SELECT t.rank, t.w, t.n, MIN(c.bsum) AS est,
         |       MIN(c.bsum) - t.n AS over
         |FROM top t
         |JOIN bk ON bk.w = t.w
         |JOIN cms c ON c.i = bk.i AND c.bucket = bk.bucket
         |GROUP BY t.rank, t.w, t.n
         |ORDER BY t.rank""".stripMargin,
    // Feature-hashing vectorizer: token hash -> bucket h%32, sign from
    // an independent LCG of the same hash; integer bucket sums
    // normalized only at the final rounded ratio.
    "q131_hashing_vectorize" ->
      s"""WITH $nCte,
         |$tokCte,
         |hv AS (SELECT doc_id, ${fullHash("w")} AS h FROM tok WHERE w <> ''),
         |bw AS (SELECT doc_id, CAST(h % 32 AS INT) AS bucket,
         |              1 - 2*(((69069*h + 362437) % ${graft.ext.TextOps.HashP}) % 2) AS sgn
         |       FROM hv),
         |rawb AS (SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS raw
         |         FROM bw GROUP BY doc_id, bucket HAVING SUM(sgn) <> 0),
         |nrm AS (SELECT doc_id, SQRT(CAST(SUM(raw*raw) AS DOUBLE)) AS nr
         |        FROM rawb GROUP BY doc_id)
         |SELECT r.doc_id, r.bucket, r.raw, ROUND(r.raw / n.nr, 4) AS weight
         |FROM rawb r JOIN nrm n ON r.doc_id = n.doc_id
         |ORDER BY r.doc_id, r.bucket""".stripMargin,
    // Exact two-sample KS over token counts, even vs odd doc ids:
    // D's numerator |cum_a·N_b − cum_b·N_a| in HUGEINT, argmax at the
    // smallest attaining value.
    "q139_token_ks_drift" ->
      s"""WITH $nCte,
         |c AS (SELECT doc_id, CAST(len(string_split(t, ' ')) AS BIGINT) AS v FROM n),
         |a AS (SELECT v, COUNT(*) AS ca FROM c WHERE doc_id % 2 = 0 GROUP BY v),
         |b AS (SELECT v, COUNT(*) AS cb FROM c WHERE doc_id % 2 = 1 GROUP BY v),
         |s AS (SELECT COALESCE(a.v, b.v) AS v, COALESCE(ca, 0) AS ca,
         |             COALESCE(cb, 0) AS cb
         |      FROM a FULL OUTER JOIN b ON a.v = b.v),
         |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         |             CAST(SUM(cb) AS BIGINT) AS n_b FROM s),
         |p AS (SELECT v, SUM(ca) OVER (ORDER BY v) AS cum_a,
         |             SUM(cb) OVER (ORDER BY v) AS cum_b FROM s),
         |d AS (SELECT v, abs(CAST(cum_a AS HUGEINT)*n_b - CAST(cum_b AS HUGEINT)*n_a) AS dnum,
         |             n_a, n_b
         |      FROM p CROSS JOIN t)
         |SELECT v AS at_value,
         |       CAST(dnum*1000000 // (CAST(n_a AS HUGEINT)*n_b) AS BIGINT) AS ks_ppm,
         |       n_a, n_b
         |FROM d ORDER BY dnum DESC, v LIMIT 1""".stripMargin,
    // Char-bigram LM scoring: each distinct bigram type's -ln P(c2|c1)
    // quantized once to integer micro-nats; per-doc aggregates are then
    // exact integers (order-independent across engines).
    "q181_bigram_lm_nll" ->
      s"""WITH $nCte,
         |b AS (SELECT doc_id, substr(t, CAST(g AS INT), 2) AS bg
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
         |      FROM dc JOIN lp ON dc.bg = lp.bg GROUP BY dc.doc_id)
         |SELECT d.doc_id, COALESCE(CAST(s.nb AS BIGINT), 0) AS n_bigrams,
         |       COALESCE(CAST(s.sl // s.nb AS BIGINT), 0) AS nll_micro
         |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // Word-bigram LM with interpolated backoff: one micro-nat
    // quantization per retained bigram type (count >= 2) and one per
    // unigram (the backoff column); identical rational-double operand
    // order on both engines; per-doc aggregates exact integers.
    "q283_word_lm" ->
      s"""WITH $nCte, $tokCte,
         |uni AS (SELECT w, COUNT(*) AS cu FROM tok GROUP BY w),
         |tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS tt,
         |               CAST(COUNT(*) AS BIGINT) AS vv FROM uni),
         |bgx AS (SELECT doc_id, parts[g] || ' ' || parts[g+1] AS bg
         |        FROM (SELECT doc_id, string_split(t, ' ') AS parts,
         |                unnest(range(1, len(string_split(t, ' ')))) AS g
         |              FROM n) z),
         |dcb AS (SELECT doc_id, bg, COUNT(*) AS c FROM bgx
         |        GROUP BY doc_id, bg),
         |cball AS (SELECT bg, CAST(SUM(c) AS BIGINT) AS cb FROM dcb
         |          GROUP BY bg),
         |c1 AS (SELECT split_part(bg, ' ', 1) AS w1,
         |              CAST(SUM(cb) AS BIGINT) AS c1 FROM cball GROUP BY 1),
         |lpb AS (SELECT cball.bg,
         |          CAST(ROUND(-ln(0.7 * cball.cb / c1.c1
         |            + 0.3 * (uni.cu + 1.0) / (tot.tt + tot.vv)) * 1000000,
         |            0) AS BIGINT) AS lp
         |        FROM cball
         |        JOIN c1 ON split_part(cball.bg, ' ', 1) = c1.w1
         |        JOIN uni ON split_part(cball.bg, ' ', 2) = uni.w
         |        CROSS JOIN tot
         |        WHERE cball.cb >= 2),
         |lpu AS (SELECT w AS w2,
         |          CAST(ROUND(-ln(0.3 * (cu + 1.0) / (tot.tt + tot.vv))
         |            * 1000000, 0) AS BIGINT) AS lpu
         |        FROM uni CROSS JOIN tot),
         |s AS (SELECT dcb.doc_id, SUM(dcb.c) AS nb,
         |        SUM(CASE WHEN lpb.lp IS NULL THEN dcb.c ELSE 0 END) AS nbo,
         |        SUM(dcb.c * COALESCE(lpb.lp, lpu.lpu)) AS sl
         |      FROM dcb
         |      LEFT JOIN lpb ON lpb.bg = dcb.bg
         |      JOIN lpu ON lpu.w2 = split_part(dcb.bg, ' ', 2)
         |      GROUP BY dcb.doc_id)
         |SELECT d.doc_id, COALESCE(CAST(s.nb AS BIGINT), 0) AS n_bigrams,
         |       COALESCE(CAST(s.nbo AS BIGINT), 0) AS n_backoff,
         |       COALESCE(CAST(s.sl // s.nb AS BIGINT), 0) AS nll_micro
         |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // CCNet head/middle/tail split: the q181 LM chain verbatim, then a
    // per-source exact-rank tertile cut (3*(pos-1) // n) and a
    // (source, bucket) rollup.
    "q300_perplexity_buckets" ->
      s"""WITH $nCte,
         |b AS (SELECT doc_id, substr(t, CAST(g AS INT), 2) AS bg
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
         |nl AS (SELECT d.doc_id, d.source, d.n_chars,
         |         COALESCE(CAST(s.sl // s.nb AS BIGINT), 0) AS nll_micro
         |       FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id),
         |ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nsrc
         |       FROM documents GROUP BY source),
         |rkd AS (SELECT nl.*, ns.nsrc, row_number() OVER (
         |          PARTITION BY nl.source
         |          ORDER BY nl.nll_micro, nl.doc_id) AS pos
         |        FROM nl JOIN ns ON nl.source = ns.source),
         |bk AS (SELECT source,
         |         CASE (3 * (pos - 1)) // nsrc WHEN 0 THEN 'head'
         |           WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket,
         |         nll_micro, n_chars FROM rkd)
         |SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(MIN(nll_micro) AS BIGINT) AS min_nll_micro,
         |       CAST(MAX(nll_micro) AS BIGINT) AS max_nll_micro,
         |       CAST(SUM(n_chars) AS BIGINT) AS n_chars
         |FROM bk GROUP BY source, bucket
         |ORDER BY source, bucket""".stripMargin,
    // Two-filter Cohen's kappa: q181 LM chain + q300 tertile head as
    // rater 2, q62 C4 keep as rater 1; exact 2x2 cells, HUGEINT
    // marginal products, sign-split ppm kappa (negative kappa = real
    // disagreement).
    "q303_filter_kappa" ->
      s"""WITH $nCte,
         |b AS (SELECT doc_id, substr(t, CAST(g AS INT), 2) AS bg
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
         |nl AS (SELECT d.doc_id, d.source,
         |         COALESCE(CAST(s.sl // s.nb AS BIGINT), 0) AS nll_micro
         |       FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id),
         |nsc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nsrc
         |        FROM documents GROUP BY source),
         |rk2 AS (SELECT nl.doc_id, nl.source,
         |          CASE WHEN (3 * (row_number() OVER (
         |            PARTITION BY nl.source
         |            ORDER BY nl.nll_micro, nl.doc_id) - 1)) // nsc.nsrc = 0
         |            THEN 1 ELSE 0 END AS r2
         |        FROM nl JOIN nsc ON nl.source = nsc.source),
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |mm AS (SELECT doc_id,
         |        CAST(len(toks) AS BIGINT) AS n_tokens,
         |        list_sum(list_transform(toks,
         |          w -> CAST(length(w) AS BIGINT)))*1.0 / len(toks) AS ml,
         |        len(list_filter(toks, w -> length(w) >= 7))*1.0
         |          / len(toks) AS lf,
         |        CAST(len(list_filter(toks,
         |          w -> w IN ('the','a','of','and','to','in'))) AS BIGINT)
         |          AS nstop
         |      FROM tk),
         |c4 AS (SELECT doc_id, CASE WHEN n_tokens < 50 THEN 0
         |         WHEN ml < 4.2 OR ml > 4.8 THEN 0 WHEN lf > 0.06 THEN 0
         |         WHEN nstop < 2 THEN 0 ELSE 1 END AS r1 FROM mm),
         |rt AS (SELECT rk2.source, c4.r1, rk2.r2
         |       FROM rk2 JOIN c4 ON rk2.doc_id = c4.doc_id),
         |per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         |          CAST(SUM(r1*r2) AS BIGINT) AS n11,
         |          CAST(SUM(r1*(1-r2)) AS BIGINT) AS n10,
         |          CAST(SUM((1-r1)*r2) AS BIGINT) AS n01,
         |          CAST(SUM((1-r1)*(1-r2)) AS BIGINT) AS n00
         |        FROM rt GROUP BY source),
         |u AS (SELECT * FROM per
         |      UNION ALL
         |      SELECT '__all__', CAST(SUM(n) AS BIGINT),
         |        CAST(SUM(n11) AS BIGINT), CAST(SUM(n10) AS BIGINT),
         |        CAST(SUM(n01) AS BIGINT), CAST(SUM(n00) AS BIGINT)
         |      FROM per),
         |k AS (SELECT source, n, n11, n10, n01, n00, n11 + n00 AS a,
         |        CAST(n11+n10 AS HUGEINT)*(n11+n01)
         |          + CAST(n00+n01 AS HUGEINT)*(n00+n10) AS e_num
         |      FROM u),
         |k2 AS (SELECT *, CAST(n AS HUGEINT)*a - e_num AS num,
         |         CAST(n AS HUGEINT)*n - e_num AS den FROM k)
         |SELECT source, n AS n_docs, n11 AS n_both_keep, n10 AS n_c4_only,
         |       n01 AS n_lm_only, n00 AS n_both_drop,
         |       CAST(a * 1000000 // n AS BIGINT) AS agree_ppm,
         |       CAST(CASE WHEN den = 0 THEN 0
         |         WHEN num < 0 THEN -((-num) * 1000000 // den)
         |         ELSE num * 1000000 // den END AS BIGINT) AS kappa_ppm
         |FROM k2 ORDER BY source""".stripMargin,
    // Kneser-Ney word-bigram LM: absolute discount 0.75 + continuation
    // backoff; one micro-nat quantization per observed bigram type with
    // identical rational-double operand order on both engines
    // ((cb-0.75)/c1 + 0.75*n1p/c1*(n1pr/bt)); per-doc aggregates exact
    // integers. Self-scoring makes the model join total; pruned types
    // (cb < 2) score on the pure continuation term and are counted as
    // n_backoff.
    "q293_kneser_ney" ->
      s"""WITH $nCte,
         |bgx AS (SELECT doc_id, parts[g] || ' ' || parts[g+1] AS bg
         |        FROM (SELECT doc_id, string_split(t, ' ') AS parts,
         |                unnest(range(1, len(string_split(t, ' ')))) AS g
         |              FROM n) z),
         |dcb AS (SELECT doc_id, bg, COUNT(*) AS c FROM bgx
         |        GROUP BY doc_id, bg),
         |cball AS (SELECT bg, CAST(SUM(c) AS BIGINT) AS cb FROM dcb
         |          GROUP BY bg),
         |c1 AS (SELECT split_part(bg, ' ', 1) AS w1,
         |              CAST(SUM(cb) AS BIGINT) AS c1,
         |              CAST(COUNT(*) AS BIGINT) AS n1p FROM cball GROUP BY 1),
         |pc AS (SELECT split_part(bg, ' ', 2) AS w2,
         |              CAST(COUNT(*) AS BIGINT) AS n1pr FROM cball GROUP BY 1),
         |bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS bt FROM cball),
         |lp AS (SELECT cball.bg,
         |          CASE WHEN cball.cb >= 2 THEN 1 ELSE 0 END AS retained,
         |          CAST(ROUND(-ln(CASE WHEN cball.cb >= 2
         |            THEN (cball.cb - 0.75) / c1.c1
         |              + 0.75 * c1.n1p / c1.c1
         |                * (CAST(pc.n1pr AS DOUBLE) / bt.bt)
         |            ELSE 0.75 * c1.n1p / c1.c1
         |                * (CAST(pc.n1pr AS DOUBLE) / bt.bt)
         |            END) * 1000000, 0) AS BIGINT) AS lp
         |       FROM cball
         |       JOIN c1 ON split_part(cball.bg, ' ', 1) = c1.w1
         |       JOIN pc ON split_part(cball.bg, ' ', 2) = pc.w2
         |       CROSS JOIN bt),
         |s AS (SELECT dcb.doc_id, SUM(dcb.c) AS nb,
         |        SUM(CASE WHEN lp.retained = 0 THEN dcb.c ELSE 0 END) AS nbo,
         |        SUM(dcb.c * lp.lp) AS sl
         |      FROM dcb JOIN lp ON lp.bg = dcb.bg GROUP BY dcb.doc_id)
         |SELECT d.doc_id, COALESCE(CAST(s.nb AS BIGINT), 0) AS n_bigrams,
         |       COALESCE(CAST(s.nbo AS BIGINT), 0) AS n_backoff,
         |       COALESCE(CAST(s.sl // s.nb AS BIGINT), 0) AS nll_micro
         |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // Character entropy: H = ln n - (1/n) sum c*ln c, every ln quantized
    // once on an integer count, aggregates exact integers after that.
    "q182_char_entropy" ->
      s"""WITH $nCte,
         |ch AS (SELECT doc_id, substr(t, CAST(g AS INT), 1) AS ch
         |       FROM (SELECT doc_id, t, unnest(range(1, length(t)+1)) AS g
         |             FROM n) z),
         |c AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch),
         |s AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS k,
         |             SUM(c * CAST(ROUND(ln(c) * 1000000, 0) AS BIGINT)) AS scl
         |      FROM c GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(CAST(s.n AS BIGINT), 0) AS n_chars,
         |       COALESCE(CAST(s.k AS BIGINT), 0) AS distinct_chars,
         |       COALESCE(CAST(ROUND(ln(s.n) * 1000000, 0) AS BIGINT)
         |                 - CAST(s.scl // s.n AS BIGINT), 0) AS entropy_micro
         |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // Pairwise JSD: probabilities floored to exact ppb, each log ratio
    // vs the mixture quantized once per (pair, term) to micro-nats
    // (the q181 contract), one-sided mass in closed form via the ln 2
    // constant; numerator clamped >= 0 before the floor division
    // (truncate-vs-floor divergence on negatives).
    "q196_js_divergence" ->
      """WITH n2 AS (SELECT source,
        |             lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |           FROM documents),
        |tk AS (SELECT source, unnest(string_split(t, ' ')) AS w FROM n2),
        |cnt AS (SELECT source, w, COUNT(*) AS c FROM tk GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY source),
        |p AS (SELECT source, w,
        |        CAST(CAST(c AS HUGEINT) * 1000000000 // n AS BIGINT) AS ppb,
        |        CAST(c AS DOUBLE) / n AS pr
        |      FROM cnt JOIN tot USING (source)),
        |j AS (SELECT a.source AS src_a, b.source AS src_b,
        |        a.ppb AS pa, b.ppb AS pb,
        |        CAST(round(ln(a.pr / ((a.pr + b.pr) / 2)) * 1e6, 0) AS BIGINT) AS la,
        |        CAST(round(ln(b.pr / ((a.pr + b.pr) / 2)) * 1e6, 0) AS BIGINT) AS lb
        |      FROM p a JOIN p b ON a.w = b.w AND a.source < b.source),
        |g AS (SELECT src_a, src_b, CAST(COUNT(*) AS INT) AS n_common_terms,
        |        CAST(SUM(pa * la + pb * lb) AS BIGINT) AS s_common,
        |        CAST(SUM(pa) AS BIGINT) AS mass_a,
        |        CAST(SUM(pb) AS BIGINT) AS mass_b
        |      FROM j GROUP BY 1, 2),
        |f AS (SELECT src_a, src_b, n_common_terms,
        |        greatest(CAST(0 AS BIGINT), s_common + 693147 *
        |          ((1000000000 - mass_a) + (1000000000 - mass_b)))
        |          // 2000000000 AS jsd_micro
        |      FROM g)
        |SELECT src_a, src_b, n_common_terms,
        |       CAST(jsd_micro AS BIGINT) AS jsd_micro,
        |       CAST(jsd_micro AS DOUBLE) / 1e6 AS jsd
        |FROM f ORDER BY src_a, src_b""".stripMargin,

    "q205_curriculum_bins" ->
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
        |sc AS (SELECT source, doc_id, n_tokens,
        |         n_stop * 1000000 // greatest(n_tokens, 1) AS score_ppm
        |       FROM st),
        |b AS (SELECT source, n_tokens, score_ppm,
        |        ntile(4) OVER (PARTITION BY source
        |                       ORDER BY score_ppm DESC, doc_id) AS bin
        |      FROM sc)
        |SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
        |       CAST(MIN(score_ppm) AS BIGINT) AS min_score_ppm,
        |       CAST(MAX(score_ppm) AS BIGINT) AS max_score_ppm
        |FROM b GROUP BY 1, 2 ORDER BY source, bin""".stripMargin,

    "q206_pmi_collocations" ->
      """WITH n2 AS (SELECT doc_id,
        |              lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |            FROM documents),
        |tkl AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n2),
        |bg AS (SELECT toks[g] || ' ' || toks[g+1] AS pair
        |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS g
        |             FROM tkl) z),
        |tb AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_bg FROM bg),
        |pc AS (SELECT pair, COUNT(*) AS c_ab FROM bg GROUP BY 1
        |       HAVING COUNT(*) >= 5),
        |uni AS (SELECT w, COUNT(*) AS c_w
        |        FROM (SELECT unnest(string_split(t, ' ')) AS w FROM n2) q
        |        GROUP BY 1),
        |j AS (SELECT string_split(pc.pair, ' ')[1] AS w1,
        |        string_split(pc.pair, ' ')[2] AS w2, pc.c_ab, tb.t_bg
        |      FROM pc, tb),
        |f AS (SELECT j.w1, j.w2, j.c_ab, ua.c_w AS c_a, ub.c_w AS c_b,
        |        CAST(round(ln(CAST(j.c_ab AS DOUBLE) * j.t_bg
        |          / ua.c_w / ub.c_w) * 1e6, 0) AS BIGINT) AS pmi_micro
        |      FROM j JOIN uni ua ON j.w1 = ua.w
        |             JOIN uni ub ON j.w2 = ub.w)
        |SELECT w1, w2, CAST(c_ab AS BIGINT) AS pair_n,
        |       CAST(c_a AS BIGINT) AS w1_n, CAST(c_b AS BIGINT) AS w2_n,
        |       pmi_micro
        |FROM f ORDER BY pmi_micro DESC, w1, w2 LIMIT 25""".stripMargin,

    // Frozen-weight classifier: the q131 signed-hash bucket counts scored
    // by the literal integer matrix W(c,b) = ((37c+11b+5) mod 17) - 8;
    // argmax ties to the smallest class id, margin = winner - runner-up.
    "q222_quality_classifier" ->
      s"""WITH $nCte,
         |$tokCte,
         |hv AS (SELECT doc_id, ${fullHash("w")} AS h FROM tok WHERE w <> ''),
         |bw AS (SELECT doc_id, CAST(h % 32 AS INT) AS bucket,
         |              1 - 2*(((69069*h + 362437) % ${graft.ext.TextOps.HashP}) % 2) AS sgn
         |       FROM hv),
         |rawb AS (SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS raw
         |         FROM bw GROUP BY doc_id, bucket HAVING SUM(sgn) <> 0),
         |sc AS (SELECT doc_id,
         |         CAST(SUM(raw * (((11*bucket + 5)  % 17) - 8)) AS BIGINT) AS logit_0,
         |         CAST(SUM(raw * (((37 + 11*bucket + 5) % 17) - 8)) AS BIGINT) AS logit_1,
         |         CAST(SUM(raw * (((74 + 11*bucket + 5) % 17) - 8)) AS BIGINT) AS logit_2
         |       FROM rawb GROUP BY doc_id),
         |p AS (SELECT *,
         |        CASE WHEN logit_0 >= logit_1 AND logit_0 >= logit_2 THEN 0
         |             WHEN logit_1 >= logit_2 THEN 1 ELSE 2 END AS predicted
         |      FROM sc)
         |SELECT doc_id, logit_0, logit_1, logit_2,
         |       CAST(predicted AS INT) AS predicted,
         |       CAST(CASE predicted
         |            WHEN 0 THEN logit_0 - greatest(logit_1, logit_2)
         |            WHEN 1 THEN logit_1 - greatest(logit_0, logit_2)
         |            ELSE logit_2 - greatest(logit_0, logit_1) END
         |         AS BIGINT) AS margin
         |FROM p ORDER BY doc_id""".stripMargin,

    // Classifier eval harness: the q222 frozen-classifier chain joined
    // against the 3-class integer rule label (fail-gate / passable /
    // stop-ratio >= 0.12 prose); full confusion-matrix rows on a 3-row
    // spine, P/R/F1 as exact floor ppm with the zero_division=0
    // convention.
    "q235_classifier_eval" ->
      s"""WITH $nCte,
         |$tokCte,
         |hv AS (SELECT doc_id, ${fullHash("w")} AS h FROM tok WHERE w <> ''),
         |bw AS (SELECT doc_id, CAST(h % 32 AS INT) AS bucket,
         |              1 - 2*(((69069*h + 362437) % ${graft.ext.TextOps.HashP}) % 2) AS sgn
         |       FROM hv),
         |rawb AS (SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS raw
         |         FROM bw GROUP BY doc_id, bucket HAVING SUM(sgn) <> 0),
         |scq AS (SELECT doc_id,
         |         CAST(SUM(raw * (((11*bucket + 5)  % 17) - 8)) AS BIGINT) AS logit_0,
         |         CAST(SUM(raw * (((37 + 11*bucket + 5) % 17) - 8)) AS BIGINT) AS logit_1,
         |         CAST(SUM(raw * (((74 + 11*bucket + 5) % 17) - 8)) AS BIGINT) AS logit_2
         |       FROM rawb GROUP BY doc_id),
         |p AS (SELECT doc_id,
         |        CASE WHEN logit_0 >= logit_1 AND logit_0 >= logit_2 THEN 0
         |             WHEN logit_1 >= logit_2 THEN 1 ELSE 2 END AS predicted
         |      FROM scq),
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              COUNT(*) FILTER (w IN ('the','a','of','and','to','in'))
         |                AS n_stop
         |       FROM tok GROUP BY doc_id),
         |lab AS (SELECT doc_id,
         |          CASE WHEN NOT (n_tokens BETWEEN 10 AND 1000
         |                         AND n_stop*20 >= n_tokens) THEN 0
         |               WHEN n_stop*1000000//n_tokens >= ${graft.ext.TextAnalysis.RuleLabelStopPpm}
         |                 THEN 2 ELSE 1 END AS class
         |        FROM st),
         |cells AS (SELECT lab.class, p.predicted, COUNT(*) AS cn
         |          FROM lab JOIN p USING (doc_id) GROUP BY 1, 2),
         |spine AS (SELECT CAST(unnest(range(0, 3)) AS INT) AS class),
         |mrow AS (SELECT class,
         |           CAST(COALESCE(SUM(cn) FILTER (predicted = 0), 0) AS BIGINT) AS pred_0,
         |           CAST(COALESCE(SUM(cn) FILTER (predicted = 1), 0) AS BIGINT) AS pred_1,
         |           CAST(COALESCE(SUM(cn) FILTER (predicted = 2), 0) AS BIGINT) AS pred_2
         |         FROM cells GROUP BY class),
         |pt AS (SELECT predicted AS class, CAST(SUM(cn) AS BIGINT) AS n_pred
         |       FROM cells GROUP BY predicted),
         |r2 AS (SELECT s.class,
         |         COALESCE(pred_0, 0) AS pred_0, COALESCE(pred_1, 0) AS pred_1,
         |         COALESCE(pred_2, 0) AS pred_2,
         |         COALESCE(pred_0, 0) + COALESCE(pred_1, 0)
         |           + COALESCE(pred_2, 0) AS n_true,
         |         COALESCE(n_pred, 0) AS n_pred
         |       FROM spine s LEFT JOIN mrow USING (class)
         |            LEFT JOIN pt USING (class)),
         |r3 AS (SELECT *, CASE class WHEN 0 THEN pred_0 WHEN 1 THEN pred_1
         |                 ELSE pred_2 END AS tp FROM r2),
         |r4 AS (SELECT *,
         |         CASE WHEN n_pred = 0 THEN 0
         |              ELSE tp*1000000//n_pred END AS precision_ppm,
         |         CASE WHEN n_true = 0 THEN 0
         |              ELSE tp*1000000//n_true END AS recall_ppm
         |       FROM r3)
         |SELECT class, pred_0, pred_1, pred_2, n_true, n_pred,
         |       CAST(tp AS BIGINT) AS tp,
         |       CAST(precision_ppm AS BIGINT) AS precision_ppm,
         |       CAST(recall_ppm AS BIGINT) AS recall_ppm,
         |       CAST(CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
         |            ELSE 2*precision_ppm*recall_ppm
         |                 //(precision_ppm + recall_ppm) END AS BIGINT) AS f1_ppm
         |FROM r4 ORDER BY class""".stripMargin,

    // BPE encode: 6 unrolled merge rounds over the word vocabulary
    // (generated — see bpeSql).
    "q232_bpe_encode" -> bpeSql,

    // WordPiece ordered merge table: the BPE mechanics (shared
    // mergeApplyCtes) with the likelihood-ratio pick — per round the
    // unigram table over the current state, the pair table, and the
    // argmax of floor(cnt*1e12 / (ca*cb)) in HUGEINT with (a, b) ties,
    // mirroring WordPiece.mergeTable's DECIMAL(38,0) quantization.
    "q313_wordpiece_merges" -> {
      val rounds = 6
      val legs = (1 to rounds).map(r =>
        s"""SELECT CAST($r AS INT) AS merge_rank, a AS left_sym,
           |       b AS right_sym, cnt AS pair_count, ca AS left_count,
           |       cb AS right_count, score_pico FROM wf$r""".stripMargin)
        .mkString("\nUNION ALL\n")
      s"""WITH $trainerBaseCtes,
         |${wpRoundCtes(rounds, "")}
         |$legs
         |ORDER BY merge_rank""".stripMargin
    },

    // BPE ordered merge table: each round's argmax pair + weighted count
    // from the shared training chain.
    "q237_bpe_merge_table" ->
      (s"""WITH ${bpeChainCtes(6)}
         |""".stripMargin +
        (1 to 6).map(r =>
          s"""SELECT CAST($r AS INT) AS merge_rank, a AS left_sym,
             |       b AS right_sym, cnt AS pair_count FROM bf$r""".stripMargin)
          .mkString("", "\nUNION ALL\n", "\nORDER BY merge_rank")),

    // Corpus-wide BPE application: word->pieces map joined onto the
    // token stream, per-source fertility/compression rollup.
    "q238_bpe_apply_rate" ->
      s"""WITH ${bpeChainCtes(6)},
         |seg2 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_pieces
         |         FROM s6 GROUP BY w),
         |tw AS (SELECT source, w FROM (
         |    SELECT d.source,
         |           unnest(string_split(lower(trim(regexp_replace(d.text, '\\s+', ' ', 'g'))), ' ')) AS w
         |    FROM documents d) z
         |  WHERE w <> '')
         |SELECT tw.source,
         |       CAST(COUNT(*) AS BIGINT) AS n_words,
         |       CAST(SUM(CASE WHEN seg2.n_pieces IS NOT NULL THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_alpha_words,
         |       CAST(SUM(COALESCE(seg2.n_pieces, 1)) AS BIGINT) AS total_pieces,
         |       CAST(SUM(length(tw.w)) AS BIGINT) AS total_chars,
         |       CAST(SUM(COALESCE(seg2.n_pieces, 1)) * 1000000
         |            // COUNT(*) AS BIGINT) AS pieces_per_word_micro,
         |       CAST(SUM(length(tw.w)) * 1000000
         |            // SUM(COALESCE(seg2.n_pieces, 1)) AS BIGINT)
         |         AS chars_per_piece_micro
         |FROM tw LEFT JOIN seg2 USING (w)
         |GROUP BY tw.source
         |ORDER BY tw.source""".stripMargin,

    // Classifier calibration: the q235 logit/rule-label chain, margin =
    // predicted logit minus runner-up, fixed-width margin bins,
    // per-bin agreement with the rule label in floor ppm.
    "q241_calibration_bins" ->
      s"""WITH $nCte,
         |$tokCte,
         |hv AS (SELECT doc_id, ${fullHash("w")} AS h FROM tok WHERE w <> ''),
         |bw AS (SELECT doc_id, CAST(h % 32 AS INT) AS bucket,
         |              1 - 2*(((69069*h + 362437) % ${graft.ext.TextOps.HashP}) % 2) AS sgn
         |       FROM hv),
         |rawb AS (SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS raw
         |         FROM bw GROUP BY doc_id, bucket HAVING SUM(sgn) <> 0),
         |scq AS (SELECT doc_id,
         |         CAST(SUM(raw * (((11*bucket + 5)  % 17) - 8)) AS BIGINT) AS logit_0,
         |         CAST(SUM(raw * (((37 + 11*bucket + 5) % 17) - 8)) AS BIGINT) AS logit_1,
         |         CAST(SUM(raw * (((74 + 11*bucket + 5) % 17) - 8)) AS BIGINT) AS logit_2
         |       FROM rawb GROUP BY doc_id),
         |p AS (SELECT doc_id, predicted,
         |        CASE predicted
         |          WHEN 0 THEN logit_0 - greatest(logit_1, logit_2)
         |          WHEN 1 THEN logit_1 - greatest(logit_0, logit_2)
         |          ELSE logit_2 - greatest(logit_0, logit_1) END AS margin
         |      FROM (SELECT *,
         |              CASE WHEN logit_0 >= logit_1 AND logit_0 >= logit_2 THEN 0
         |                   WHEN logit_1 >= logit_2 THEN 1 ELSE 2 END AS predicted
         |            FROM scq) z),
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              COUNT(*) FILTER (w IN ('the','a','of','and','to','in'))
         |                AS n_stop
         |       FROM tok GROUP BY doc_id),
         |lab AS (SELECT doc_id,
         |          CASE WHEN NOT (n_tokens BETWEEN 10 AND 1000
         |                         AND n_stop*20 >= n_tokens) THEN 0
         |               WHEN n_stop*1000000//n_tokens >= ${graft.ext.TextAnalysis.RuleLabelStopPpm}
         |                 THEN 2 ELSE 1 END AS label
         |        FROM st),
         |jb AS (SELECT p.margin // 40 AS bin, p.margin,
         |         CASE WHEN p.predicted = lab.label THEN 1 ELSE 0 END AS agree
         |       FROM p JOIN lab USING (doc_id))
         |SELECT CAST(bin AS BIGINT) AS bin,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(agree) AS BIGINT) AS n_agree,
         |       CAST(SUM(agree) * 1000000 // COUNT(*) AS BIGINT) AS agree_ppm,
         |       CAST(MIN(margin) AS BIGINT) AS min_margin,
         |       CAST(MAX(margin) AS BIGINT) AS max_margin,
         |       CAST(SUM(margin) // COUNT(*) AS BIGINT) AS mean_margin
         |FROM jb GROUP BY bin
         |ORDER BY bin""".stripMargin,

    // PSI drift: token-count bins (width 16), even-id reference half vs
    // odd-id current half per source, add-one smoothing over the joint
    // bin spine, ln terms via the q196 round-e6 cross-engine idiom,
    // sum clamped >= 0 before the e6 floor division.
    "q242_psi_drift" ->
      s"""WITH $nCte,
         |tk AS (SELECT d.doc_id, d.source,
         |         CAST(len(string_split(n.t, ' ')) AS BIGINT) AS n_tokens
         |       FROM documents d JOIN n USING (doc_id)),
         |c0 AS (SELECT source, doc_id % 2 AS half, n_tokens // 16 AS bin FROM tk),
         |cnt AS (SELECT source, half, bin, COUNT(*) AS c
         |        FROM c0 GROUP BY 1, 2, 3),
         |r AS (SELECT source, bin, c AS cr FROM cnt WHERE half = 0),
         |cu AS (SELECT source, bin, c AS cc FROM cnt WHERE half = 1),
         |sp AS (SELECT COALESCE(r.source, cu.source) AS source,
         |         COALESCE(r.bin, cu.bin) AS bin,
         |         COALESCE(cr, 0) AS cr, COALESCE(cc, 0) AS cc
         |       FROM r FULL OUTER JOIN cu
         |         ON r.source = cu.source AND r.bin = cu.bin),
         |s2 AS (SELECT *, cr + 1 AS cr1, cc + 1 AS cc1 FROM sp),
         |tt AS (SELECT source, CAST(SUM(cr) AS BIGINT) AS n_ref,
         |         CAST(SUM(cc) AS BIGINT) AS n_cur,
         |         CAST(SUM(cr1) AS BIGINT) AS nr,
         |         CAST(SUM(cc1) AS BIGINT) AS nc,
         |         COUNT(*) AS n_bins
         |       FROM s2 GROUP BY source),
         |tm AS (SELECT s2.source,
         |         cr1 * 1000000 // nr - cc1 * 1000000 // nc AS dppm,
         |         CAST(round(ln((CAST(cr1 AS DOUBLE)/nr)
         |           / (CAST(cc1 AS DOUBLE)/nc)) * 1e6, 0) AS BIGINT) AS l_e6
         |       FROM s2 JOIN tt USING (source))
         |SELECT tt.source, tt.n_ref AS n_ref_docs, tt.n_cur AS n_cur_docs,
         |       CAST(tt.n_bins AS INT) AS n_bins,
         |       CAST(greatest(0, SUM(dppm * l_e6)) // 1000000 AS BIGINT)
         |         AS psi_micro
         |FROM tm JOIN tt ON tm.source = tt.source
         |GROUP BY tt.source, tt.n_ref, tt.n_cur, tt.n_bins
         |ORDER BY tt.source""".stripMargin,

    // DSIR importance weights: hashed unigram buckets (dim 64), target
    // = lang 'en' slice, add-one-smoothed per-bucket log importance in
    // round-e6 micro-nats, per-doc token-summed weight, top-40.
    "q243_dsir_weights" ->
      s"""WITH $nCte,
         |$tokCte,
         |hv AS (SELECT doc_id, ${fullHash("w")} AS h FROM tok WHERE w <> ''),
         |bw AS (SELECT doc_id, CAST(h % 64 AS INT) AS bucket FROM hv),
         |pd AS (SELECT doc_id, bucket, COUNT(*) AS c FROM bw GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt
         |       FROM documents),
         |bb AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS ca,
         |         CAST(SUM(CASE WHEN tgt = 1 THEN c ELSE 0 END) AS BIGINT) AS ct
         |       FROM pd JOIN dl USING (doc_id) GROUP BY bucket),
         |spn AS (SELECT CAST(unnest(range(0, 64)) AS INT) AS bucket),
         |sp2 AS (SELECT spn.bucket, COALESCE(ca, 0) + 1 AS ca1,
         |          COALESCE(ct, 0) + 1 AS ct1
         |        FROM spn LEFT JOIN bb USING (bucket)),
         |tts AS (SELECT CAST(SUM(ca1) AS BIGINT) AS na,
         |          CAST(SUM(ct1) AS BIGINT) AS nt FROM sp2),
         |wt AS (SELECT bucket,
         |         CAST(round(ln((CAST(ct1 AS DOUBLE)/nt)
         |           / (CAST(ca1 AS DOUBLE)/na)) * 1e6, 0) AS BIGINT) AS lw
         |       FROM sp2 CROSS JOIN tts),
         |dw AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |         CAST(SUM(c * lw) AS BIGINT) AS w
         |       FROM pd JOIN wt USING (bucket) GROUP BY doc_id)
         |SELECT d.doc_id, d.source, d.lang, dw.n_tokens,
         |       dw.w AS weight_e6
         |FROM dw JOIN documents d USING (doc_id)
         |ORDER BY weight_e6 DESC, d.doc_id
         |LIMIT 40""".stripMargin,

    // Quality threshold sweep: stopword-ppm score bins (width 50k),
    // cumulative keep-above volumes, token share in floor ppm.
    "q249_quality_sweep" ->
      s"""WITH $nCte,
         |$tokCte,
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              COUNT(*) FILTER (w IN ('the','a','of','and','to','in'))
         |                AS n_stop
         |       FROM tok GROUP BY doc_id),
         |sc AS (SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
         |         (n_stop * 1000000 // greatest(n_tokens, 1)) // 50000 AS bin
         |       FROM st),
         |bn AS (SELECT bin, COUNT(*) AS n_docs,
         |         CAST(SUM(n_tokens) AS BIGINT) AS tokens
         |       FROM sc GROUP BY bin),
         |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tt FROM bn),
         |cm AS (SELECT a.bin, CAST(SUM(b.n_docs) AS BIGINT) AS cum_docs,
         |         CAST(SUM(b.tokens) AS BIGINT) AS cum_tokens
         |       FROM bn a JOIN bn b ON b.bin >= a.bin GROUP BY a.bin)
         |SELECT CAST(bn.bin AS BIGINT) AS bin,
         |       CAST(bn.bin * 50000 AS BIGINT) AS threshold_ppm,
         |       CAST(bn.n_docs AS BIGINT) AS n_docs, bn.tokens,
         |       cm.cum_docs, cm.cum_tokens,
         |       CAST(cm.cum_tokens * 1000000 // tot.tt AS BIGINT)
         |         AS cum_token_share_ppm
         |FROM bn JOIN cm USING (bin) CROSS JOIN tot
         |ORDER BY bin""".stripMargin,

    // BPE vocab-size sweep: the one training's per-round states s0..s6
    // aggregated into the fertility/compression curve.
    "q251_bpe_sweep" ->
      (s"""WITH ${bpeChainCtes(6)}
         |""".stripMargin +
        (0 to 6).map(r =>
          s"""SELECT CAST($r AS INT) AS round,
             |       CAST(COUNT(*) AS BIGINT) AS n_vocab_words,
             |       CAST(SUM(freq) AS BIGINT) AS corpus_words,
             |       CAST(SUM(freq * length(w)) AS BIGINT) AS corpus_chars,
             |       CAST(SUM(freq * p) AS BIGINT) AS corpus_pieces,
             |       CAST(SUM(freq * p) * 1000000 // SUM(freq) AS BIGINT)
             |         AS fertility_micro,
             |       CAST(SUM(freq * length(w)) * 1000000 // SUM(freq * p)
             |         AS BIGINT) AS chars_per_piece_micro
             |FROM (SELECT w, COUNT(*) AS p FROM s$r GROUP BY w) seg
             |     JOIN bvocab USING (w)""".stripMargin)
          .mkString("", "\nUNION ALL\n", "\nORDER BY round")),

    // Split-conformal selective prediction: even-half margin threshold
    // (k-th order statistic over the distinct-margin spine), odd-half
    // accept/abstain accuracy per predicted class.
    "q256_conformal" ->
      s"""WITH $nCte,
         |$tokCte,
         |hv AS (SELECT doc_id, ${fullHash("w")} AS h FROM tok WHERE w <> ''),
         |bw AS (SELECT doc_id, CAST(h % 32 AS INT) AS bucket,
         |              1 - 2*(((69069*h + 362437) % ${graft.ext.TextOps.HashP}) % 2) AS sgn
         |       FROM hv),
         |rawb AS (SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS raw
         |         FROM bw GROUP BY doc_id, bucket HAVING SUM(sgn) <> 0),
         |scq AS (SELECT doc_id,
         |         CAST(SUM(raw * (((11*bucket + 5)  % 17) - 8)) AS BIGINT) AS logit_0,
         |         CAST(SUM(raw * (((37 + 11*bucket + 5) % 17) - 8)) AS BIGINT) AS logit_1,
         |         CAST(SUM(raw * (((74 + 11*bucket + 5) % 17) - 8)) AS BIGINT) AS logit_2
         |       FROM rawb GROUP BY doc_id),
         |p AS (SELECT doc_id, predicted,
         |        CASE predicted
         |          WHEN 0 THEN logit_0 - greatest(logit_1, logit_2)
         |          WHEN 1 THEN logit_1 - greatest(logit_0, logit_2)
         |          ELSE logit_2 - greatest(logit_0, logit_1) END AS margin
         |      FROM (SELECT *,
         |              CASE WHEN logit_0 >= logit_1 AND logit_0 >= logit_2 THEN 0
         |                   WHEN logit_1 >= logit_2 THEN 1 ELSE 2 END AS predicted
         |            FROM scq) z),
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              COUNT(*) FILTER (w IN ('the','a','of','and','to','in'))
         |                AS n_stop
         |       FROM tok GROUP BY doc_id),
         |lab AS (SELECT doc_id,
         |          CASE WHEN NOT (n_tokens BETWEEN 10 AND 1000
         |                         AND n_stop*20 >= n_tokens) THEN 0
         |               WHEN n_stop*1000000//n_tokens >= ${graft.ext.TextAnalysis.RuleLabelStopPpm}
         |                 THEN 2 ELSE 1 END AS label
         |        FROM st),
         |jj AS (SELECT p.doc_id, p.predicted, p.margin, lab.label,
         |         CAST(p.doc_id % 2 AS INT) AS half
         |       FROM p JOIN lab USING (doc_id)),
         |cal AS (SELECT * FROM jj WHERE half = 0),
         |nc AS (SELECT COUNT(*) AS n_cal,
         |         (COUNT(*) + 1) * 100000 // 1000000 AS k FROM cal),
         |mc AS (SELECT margin, COUNT(*) AS c FROM cal GROUP BY margin),
         |pf AS (SELECT margin, c,
         |         COALESCE(SUM(c) OVER (ORDER BY margin
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS before
         |       FROM mc),
         |tu AS (SELECT COALESCE(MIN(margin), 0) AS tau
         |       FROM pf CROSS JOIN nc WHERE before + c >= k),
         |te AS (SELECT jj.*,
         |         CASE WHEN margin >= tau THEN 1 ELSE 0 END AS acc,
         |         CASE WHEN predicted = label THEN 1 ELSE 0 END AS ok
         |       FROM jj CROSS JOIN tu WHERE half = 1),
         |ag AS (SELECT predicted, COUNT(*) AS n_test,
         |         CAST(SUM(acc) AS BIGINT) AS n_accepted,
         |         CAST(SUM(acc*ok) AS BIGINT) AS n_acc_ok,
         |         CAST(SUM((1-acc)*ok) AS BIGINT) AS n_rej_ok
         |       FROM te GROUP BY predicted)
         |SELECT predicted, CAST(n_test AS BIGINT) AS n_test, n_accepted,
         |       CAST(n_accepted * 1000000 // n_test AS BIGINT) AS accept_ppm,
         |       CAST(CASE WHEN n_accepted = 0 THEN 0
         |            ELSE n_acc_ok * 1000000 // n_accepted END AS BIGINT)
         |         AS acc_accepted_ppm,
         |       CAST(CASE WHEN n_test = n_accepted THEN 0
         |            ELSE n_rej_ok * 1000000 // (n_test - n_accepted) END
         |         AS BIGINT) AS acc_rejected_ppm,
         |       CAST(tau AS BIGINT) AS tau,
         |       CAST(n_cal AS BIGINT) AS n_cal, CAST(k AS BIGINT) AS k
         |FROM ag CROSS JOIN tu CROSS JOIN nc
         |ORDER BY predicted""".stripMargin,

    // Good-Turing coverage + bias-corrected Chao1 richness per source.
    "q272_good_turing" ->
      s"""WITH $nCte, $tokCte,
         |vb AS (SELECT d.source, tok.w, COUNT(*) AS freq
         |       FROM tok JOIN documents d USING (doc_id)
         |       WHERE tok.w <> '' GROUP BY 1, 2),
         |ag AS (SELECT source, SUM(freq) AS n_tokens, COUNT(*) AS vocab,
         |         SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS n1,
         |         SUM(CASE WHEN freq = 2 THEN 1 ELSE 0 END) AS n2
         |       FROM vb GROUP BY source)
         |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
         |       CAST(vocab AS BIGINT) AS vocab,
         |       CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |       CAST(n1 * 1000000 // n_tokens AS BIGINT) AS unseen_ppm,
         |       CAST((n_tokens - n1) * 1000000 // n_tokens AS BIGINT)
         |         AS coverage_ppm,
         |       CAST(vocab + n1 * (n1 - 1) // (2 * (n2 + 1)) AS BIGINT)
         |         AS chao1_vocab
         |FROM ag
         |ORDER BY source""".stripMargin,

    // Distinct-n diversity per source: distinct/total word n-gram
    // ratios for n = 1..3, hashed by the shared rolling kernel.
    "q275_distinct_ngrams" ->
      s"""WITH $nCte,
         |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM n),
         |sm AS (SELECT d.doc_id, d.source, tk.toks
         |       FROM documents d JOIN tk USING (doc_id)),
         |g1 AS (SELECT source, ${fullHash("(toks[g])")} AS h
         |       FROM (SELECT source, toks,
         |               unnest(range(1, len(toks) + 1)) AS g FROM sm) z),
         |g2 AS (SELECT source, ${fullHash("(toks[g] || ' ' || toks[g+1])")} AS h
         |       FROM (SELECT source, toks,
         |               unnest(range(1, len(toks))) AS g FROM sm) z),
         |g3 AS (SELECT source, ${fullHash("(toks[g] || ' ' || toks[g+1] || ' ' || toks[g+2])")} AS h
         |       FROM (SELECT source, toks,
         |               unnest(range(1, len(toks) - 1)) AS g FROM sm) z),
         |u AS (SELECT source, 1 AS n, COUNT(*) AS n_total,
         |             COUNT(DISTINCT h) AS n_distinct FROM g1 GROUP BY source
         |      UNION ALL
         |      SELECT source, 2, COUNT(*), COUNT(DISTINCT h)
         |      FROM g2 GROUP BY source
         |      UNION ALL
         |      SELECT source, 3, COUNT(*), COUNT(DISTINCT h)
         |      FROM g3 GROUP BY source)
         |SELECT source, CAST(n AS INT) AS n,
         |       CAST(n_total AS BIGINT) AS n_total,
         |       CAST(n_distinct AS BIGINT) AS n_distinct,
         |       CAST(n_distinct * 1000000 // n_total AS BIGINT)
         |         AS distinct_ppm
         |FROM u
         |ORDER BY source, n""".stripMargin,

    // Zipf rank-frequency fit: per-source OLS of ln(freq) on ln(rank)
    // over the top-100 vocabulary; negative numerators sign-split.
    "q271_zipf_fit" ->
      s"""WITH $nCte, $tokCte,
         |vb AS (SELECT d.source, tok.w, COUNT(*) AS freq
         |       FROM tok JOIN documents d USING (doc_id)
         |       WHERE tok.w <> '' GROUP BY 1, 2),
         |rk AS (SELECT source, freq, row_number() OVER (
         |         PARTITION BY source ORDER BY freq DESC, w) AS rank
         |       FROM vb),
         |xy AS (SELECT source,
         |         CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6, 0) AS BIGINT)
         |           AS x,
         |         CAST(round(ln(CAST(freq AS DOUBLE)) * 1e6, 0) AS BIGINT)
         |           AS y
         |       FROM rk WHERE rank <= 100),
         |mm AS (SELECT source, COUNT(*) AS n,
         |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         |         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         |         SUM(CAST(y AS HUGEINT) * y) AS syy
         |       FROM xy GROUP BY source),
         |cf AS (SELECT source, n, sx, sy,
         |         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS ca,
         |         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS cd,
         |         CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS sst
         |       FROM mm),
         |sl AS (SELECT *, CASE WHEN cd < 0
         |           THEN -(((-cd) * 1000000) // ca)
         |           ELSE (cd * 1000000) // ca END AS slope
         |       FROM cf WHERE ca > 0 AND sst > 0),
         |ic AS (SELECT *, CAST(sy AS HUGEINT) * 1000000
         |         - CAST(slope AS HUGEINT) * sx AS inum FROM sl)
         |SELECT source, CAST(n AS INT) AS n_ranks,
         |       CAST(slope AS BIGINT) AS slope_e6,
         |       CAST(CASE WHEN inum < 0
         |            THEN -((-inum) // (CAST(n AS HUGEINT) * 1000000))
         |            ELSE inum // (CAST(n AS HUGEINT) * 1000000) END
         |         AS BIGINT) AS intercept_e6,
         |       CAST(ROUND(CAST(cd AS DOUBLE) * CAST(cd AS DOUBLE)
         |         / (CAST(ca AS DOUBLE) * CAST(sst AS DOUBLE)) * 1000000, 0)
         |         AS BIGINT) AS r2_ppm
         |FROM ic
         |ORDER BY source""".stripMargin,
  )
}
