package graft.oracle

import graft.oracle.OracleDialect._

/** DuckDB oracle SQL — multimodal tier
  * (8 queries). Values are verbatim from SparkEntry.scala
  * (round-11 mechanical split); SparkEntry.oracleSql concatenates the
  * domain maps, and QueriesSpec pins key-set equality (both directions) with the
  * query registry. */
object OracleMultimodal {
  private[graft] val sql: Map[String, String] = Map(
    // Mirrors the payload builders' integer arithmetic — every modality
    // is a real container decode of a deterministically-built file: BMP
    // byte layout (54-byte headers + 4-byte-padded pixel rows) for image
    // rows, canonical PCM WAV layout (44-byte header, zero-pad to block
    // align) for audio rows, animated GIF layout (13+6 header/GCT bytes,
    // per frame 8-byte GCE + 10-byte descriptor + LZW-size byte + data
    // split into <=255-byte length-prefixed sub-blocks + terminator,
    // 1-byte trailer) for video rows.
    "q39_multimodal_meta" ->
      """WITH m AS (SELECT doc_id,
        |                  CAST(doc_id % 3 AS INT) AS m3,
        |                  CAST(1 + doc_id % 64 AS INT) AS bw,
        |                  CAST(1 + (doc_id * 7) % 64 AS INT) AS bh,
        |                  CAST(1 + doc_id % 2 AS INT) AS ch,
        |                  CAST(8000 + (doc_id % 5) * 4000 AS INT) AS sr,
        |                  CAST(1 + doc_id % 32 AS INT) AS vw,
        |                  CAST(1 + (doc_id * 3) % 32 AS INT) AS vh,
        |                  CAST(1 + doc_id % 10 AS INT) AS vf,
        |                  length(text) AS tlen
        |           FROM documents),
        |m2 AS (SELECT *, tlen + CASE WHEN tlen % ch = 0 THEN 0 ELSE 1 END AS adata,
        |              vw*vh + (vw*vh + 124)//125 + 1 AS lz
        |       FROM m)
        |SELECT doc_id,
        |       CASE m3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |       CAST(CASE WHEN m3 = 0 THEN 54 + ((bw*3+3)//4)*4*bh
        |                 WHEN m3 = 1 THEN 44 + adata
        |                 ELSE 398 + vf*(20 + lz + (lz + 254)//255) END AS BIGINT) AS byte_len,
        |       CAST(CASE WHEN m3 = 0 THEN bw WHEN m3 = 1 THEN 0
        |                 ELSE vw END AS INT) AS width,
        |       CAST(CASE WHEN m3 = 0 THEN bh WHEN m3 = 1 THEN 0
        |                 ELSE vh END AS INT) AS height,
        |       CAST(CASE WHEN m3 = 2 THEN vf
        |                 WHEN m3 = 1 THEN adata // ch
        |                 ELSE 1 END AS INT) AS n_frames,
        |       CAST(CASE WHEN m3 = 1 THEN sr ELSE 0 END AS INT) AS sample_rate,
        |       CAST(CASE WHEN m3 = 1 THEN ch ELSE 0 END AS INT) AS n_channels
        |FROM m2
        |ORDER BY doc_id""".stripMargin,
    "q40_frame_sample" ->
      """WITH m AS (SELECT doc_id, 1 + doc_id % 10 AS n_frames
        |           FROM documents WHERE doc_id % 3 = 2)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx
        |FROM (SELECT doc_id, unnest(range(0, n_frames, 5)) AS frame_idx FROM m) z
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // GIF pixel stats: the oracle replays the payload-generation
    // arithmetic — pixels are text bytes & 0x7f cycled globally across
    // vf frames of vw×vh — as cycle-count × whole-text sum plus a
    // prefix remainder, so the engine's REAL container walk + LZW
    // decode must reproduce the exact integers. (documents text is
    // ASCII, the standing q39 contract, so ord() IS the byte.)
    "q126_gif_pixel_stats" ->
      """WITH v AS (SELECT doc_id, text,
        |                  CAST(1 + doc_id % 32 AS INT) AS vw,
        |                  CAST(1 + (doc_id*3) % 32 AS INT) AS vh,
        |                  CAST(1 + doc_id % 10 AS INT) AS vf,
        |                  length(text) AS len
        |           FROM documents WHERE doc_id % 3 = 2),
        |g AS (SELECT doc_id, text, len, vf,
        |             CAST(vf AS BIGINT)*vw*vh AS npx FROM v),
        |b AS (SELECT doc_id, gi,
        |             ord(substr(text, CAST(gi + 1 AS INT), 1)) % 128 AS bv
        |      FROM (SELECT doc_id, text, unnest(range(len)) AS gi FROM g) z),
        |agg AS (SELECT doc_id, SUM(bv) AS s_all FROM b GROUP BY doc_id),
        |pre AS (SELECT b.doc_id, SUM(bv) AS s_pre
        |        FROM b JOIN g ON b.doc_id = g.doc_id
        |        WHERE b.gi < g.npx % g.len GROUP BY b.doc_id),
        |mx AS (SELECT b.doc_id, MAX(bv) AS m
        |       FROM b JOIN g ON b.doc_id = g.doc_id
        |       WHERE b.gi < LEAST(g.npx, CAST(g.len AS BIGINT))
        |       GROUP BY b.doc_id)
        |SELECT g.doc_id, vf AS n_frames, npx AS n_pixels,
        |       CAST(CASE WHEN len = 0 THEN 0
        |            ELSE (npx // len) * a.s_all + COALESCE(p.s_pre, 0)
        |            END AS BIGINT) AS sum_px,
        |       CAST(COALESCE(m.m, 0) AS INT) AS max_px,
        |       ROUND(CAST(CASE WHEN len = 0 THEN 0
        |            ELSE (npx // len) * a.s_all + COALESCE(p.s_pre, 0)
        |            END AS DOUBLE) / npx, 4) AS mean_px
        |FROM g LEFT JOIN agg a ON g.doc_id = a.doc_id
        |       LEFT JOIN pre p ON g.doc_id = p.doc_id
        |       LEFT JOIN mx m ON g.doc_id = m.doc_id
        |ORDER BY g.doc_id""".stripMargin,
    // WAV audio stats: the oracle replays the payload-generation
    // arithmetic — 8-bit PCM samples are the text bytes zero-padded to
    // channel alignment, deinterleaved by `gi % ch` — so the engine's
    // REAL RIFF parse + deinterleave + integer aggregation must
    // reproduce the exact sums. Crossings compare the exact integer
    // deviation `amp·n − Σamp` (mean-crossing without any division).
    "q127_wav_audio_stats" ->
      """WITH a AS (SELECT doc_id, text,
        |                  CAST(1 + doc_id % 2 AS INT) AS ch,
        |                  length(text) AS len
        |           FROM documents WHERE doc_id % 3 = 1),
        |d AS (SELECT doc_id, ch, len, text,
        |             len + CASE WHEN len % ch = 0 THEN 0 ELSE 1 END AS dlen
        |      FROM a),
        |s AS (SELECT doc_id, CAST(gi % ch AS INT) AS channel, gi,
        |             (CASE WHEN gi < len
        |                   THEN ord(substr(text, CAST(gi + 1 AS INT), 1))
        |                   ELSE 0 END) - 128 AS amp
        |      FROM (SELECT doc_id, ch, len, text,
        |                   unnest(range(dlen)) AS gi FROM d) z),
        |g AS (SELECT doc_id, channel, COUNT(*) AS n,
        |             SUM(amp) AS sum_amp, SUM(amp*amp) AS sum_sq,
        |             MAX(ABS(amp)) AS peak
        |      FROM s GROUP BY doc_id, channel),
        |x AS (SELECT s.doc_id, s.channel,
        |             s.amp * g.n - g.sum_amp AS dev,
        |             LEAD(s.amp * g.n - g.sum_amp)
        |               OVER (PARTITION BY s.doc_id, s.channel
        |                     ORDER BY s.gi) AS ndev
        |      FROM s JOIN g ON s.doc_id = g.doc_id AND s.channel = g.channel),
        |c AS (SELECT doc_id, channel,
        |             SUM(CASE WHEN (dev > 0 AND ndev < 0)
        |                        OR (dev < 0 AND ndev > 0)
        |                      THEN 1 ELSE 0 END) AS n_crossings
        |      FROM x GROUP BY doc_id, channel)
        |SELECT g.doc_id, g.channel,
        |       CAST(g.n AS BIGINT) AS n_samples,
        |       CAST(g.sum_amp AS BIGINT) AS sum_amp,
        |       CAST(g.sum_sq AS BIGINT) AS sum_sq,
        |       CAST(g.peak AS INT) AS peak,
        |       CAST(COALESCE(c.n_crossings, 0) AS BIGINT) AS n_crossings,
        |       ROUND(CAST(g.sum_amp AS DOUBLE) / g.n, 4) AS mean_amp,
        |       ROUND(SQRT(CAST(g.sum_sq AS DOUBLE) / g.n), 4) AS rms
        |FROM g LEFT JOIN c ON g.doc_id = c.doc_id AND g.channel = c.channel
        |ORDER BY g.doc_id, g.channel""".stripMargin,
    // WAV autocorrelation: R(L) = Σ amp_i·amp_{i+L} within each channel
    // (LEAD skips nulls past the end, COALESCE handles n ≤ L), exact
    // integers normalized by R(0) only at the final rounded ratio.
    "q128_wav_autocorr" ->
      """WITH a AS (SELECT doc_id, text,
        |                  CAST(1 + doc_id % 2 AS INT) AS ch,
        |                  length(text) AS len
        |           FROM documents WHERE doc_id % 3 = 1),
        |d AS (SELECT doc_id, ch, len, text,
        |             len + CASE WHEN len % ch = 0 THEN 0 ELSE 1 END AS dlen
        |      FROM a),
        |s AS (SELECT doc_id, CAST(gi % ch AS INT) AS channel, gi,
        |             (CASE WHEN gi < len
        |                   THEN ord(substr(text, CAST(gi + 1 AS INT), 1))
        |                   ELSE 0 END) - 128 AS amp
        |      FROM (SELECT doc_id, ch, len, text,
        |                   unnest(range(dlen)) AS gi FROM d) z),
        |w AS (SELECT doc_id, channel, amp,
        |             LEAD(amp, 1) OVER win AS a1,
        |             LEAD(amp, 2) OVER win AS a2,
        |             LEAD(amp, 4) OVER win AS a4,
        |             LEAD(amp, 8) OVER win AS a8
        |      FROM s WINDOW win AS (PARTITION BY doc_id, channel
        |                            ORDER BY gi))
        |SELECT doc_id, channel,
        |       CAST(COUNT(*) AS BIGINT) AS n_samples,
        |       CAST(SUM(amp*amp) AS BIGINT) AS r0,
        |       ROUND(CAST(COALESCE(SUM(amp*a1), 0) AS DOUBLE)
        |             / SUM(amp*amp), 4) AS ac1,
        |       ROUND(CAST(COALESCE(SUM(amp*a2), 0) AS DOUBLE)
        |             / SUM(amp*amp), 4) AS ac2,
        |       ROUND(CAST(COALESCE(SUM(amp*a4), 0) AS DOUBLE)
        |             / SUM(amp*amp), 4) AS ac4,
        |       ROUND(CAST(COALESCE(SUM(amp*a8), 0) AS DOUBLE)
        |             / SUM(amp*amp), 4) AS ac8
        |FROM w GROUP BY doc_id, channel
        |ORDER BY doc_id, channel""".stripMargin,
    // End-to-end multimodal retrieval (exact tier): rebuild the decoded
    // pixel histogram from the payload-generation arithmetic (q126's
    // cyclic-fill model: pixels = text bytes mod 128 cycled over
    // npx = frames*w*h), exact integer-ppm features, integer dot-product
    // brute top-k.
    "q177_mm_retrieval" ->
      s"""WITH $mmFeatureCtes,
         |q AS (SELECT doc_id AS query_id, fv AS qf FROM f WHERE doc_id < 30),
         |sc AS (SELECT q.query_id, c.doc_id AS neighbor_id,
         |              CAST($mmDotExpr AS BIGINT) AS score
         |       FROM f c CROSS JOIN q WHERE c.doc_id <> q.query_id),
         |rk AS (SELECT query_id, neighbor_id, score,
         |              row_number() OVER (PARTITION BY query_id
         |                ORDER BY score DESC, neighbor_id) AS rnk
         |       FROM sc)
         |SELECT query_id, neighbor_id, score, CAST(rnk AS INT) AS rank
         |FROM rk WHERE rnk <= 3
         |ORDER BY query_id, rank""".stripMargin,
    // Celled tier: same features, candidates restricted to the query's
    // dominant-bucket cell (first argmax — a deterministic integer).
    "q178_mm_retrieval_cells" ->
      s"""WITH $mmFeatureCtes,
         |fc AS (SELECT doc_id, fv,
         |              CAST(list_position(fv, list_max(fv)) AS INT) AS cell
         |       FROM f),
         |q AS (SELECT doc_id AS query_id, fv AS qf, cell
         |      FROM fc WHERE doc_id < 30),
         |sc AS (SELECT q.query_id, c.doc_id AS neighbor_id, c.cell,
         |              CAST($mmDotExpr AS BIGINT) AS score
         |       FROM fc c JOIN q ON c.cell = q.cell AND c.doc_id <> q.query_id),
         |rk AS (SELECT query_id, neighbor_id, cell, score,
         |              row_number() OVER (PARTITION BY query_id
         |                ORDER BY score DESC, neighbor_id) AS rnk
         |       FROM sc)
         |SELECT query_id, neighbor_id, cell, score, CAST(rnk AS INT) AS rank
         |FROM rk WHERE rnk <= 3
         |ORDER BY query_id, rank""".stripMargin,
    // Learned-embedding stand-in tier: project the same decoded ppm
    // histogram through the frozen integer weight matrix
    // W(k,j) = ((37k+11j+5) mod 17) - 8, then brute top-k by exact
    // integer dot product in the 4-dim embedded space.
    "q179_mm_embed_topk" ->
      s"""WITH $mmFeatureCtes,
         |emb AS (SELECT doc_id, ${mmEmbCol(0)} AS e0, ${mmEmbCol(1)} AS e1,
         |               ${mmEmbCol(2)} AS e2, ${mmEmbCol(3)} AS e3 FROM f),
         |q AS (SELECT doc_id AS query_id, e0 AS q0, e1 AS q1, e2 AS q2,
         |             e3 AS q3 FROM emb WHERE doc_id < 30),
         |sc AS (SELECT q.query_id, c.doc_id AS neighbor_id,
         |              CAST(q.q0*c.e0 + q.q1*c.e1 + q.q2*c.e2 + q.q3*c.e3
         |                   AS BIGINT) AS score
         |       FROM emb c CROSS JOIN q WHERE c.doc_id <> q.query_id),
         |rk AS (SELECT query_id, neighbor_id, score,
         |              row_number() OVER (PARTITION BY query_id
         |                ORDER BY score DESC, neighbor_id) AS rnk
         |       FROM sc)
         |SELECT query_id, neighbor_id, score, CAST(rnk AS INT) AS rank
         |FROM rk WHERE rnk <= 3
         |ORDER BY query_id, rank""".stripMargin,
    // Perceptual aHash near-dup: the oracle replays the frame-0 pixel
    // arithmetic (text bytes & 0x7f, row-major vw x vh), block-averages
    // ASCII ASSUMPTION: this replay uses CHARACTER code points
    // (ord(substr(text,...)) % 128) and length(text) in CHARACTERS,
    // while the engine's gifPayload/gifAHash use UTF-8 BYTES (& 0x7f)
    // and byte length. Parity holds because the documents fixture is
    // pure ASCII (code point == byte there); a non-ASCII fixture would
    // need the oracle pixel stream derived from encode(text, 'UTF-8')
    // octets instead, or the hashes silently diverge. GUARDED: Verify
    // asserts octet_length == length over the whole fixture before
    // every dump, so a fixture change fails loudly, never silently.
    // into the 4x4 mosaic with the exact integer cross-multiply
    // threshold, and mirrors the two 8-bit-band candidate join + exact
    // hamming verify — so the engine's real LZW decode + fingerprint +
    // banded near-dup join are value-checked end to end.
    "q295_ahash_near_dup" ->
      """WITH v AS (SELECT doc_id, text,
        |             CAST(1 + doc_id % 32 AS INT) AS vw,
        |             CAST(1 + (doc_id*3) % 32 AS INT) AS vh,
        |             length(text) AS len
        |           FROM documents WHERE doc_id % 3 = 2),
        |px AS (SELECT doc_id, vw, vh,
        |         CAST(gi % vw AS INT) AS x, CAST(gi // vw AS INT) AS y,
        |         CASE WHEN len = 0 THEN 0
        |           ELSE ord(substr(text, CAST((gi % len) + 1 AS INT), 1)) % 128
        |           END AS bv
        |       FROM (SELECT doc_id, text, vw, vh, len,
        |               unnest(range(CAST(vw AS BIGINT)*vh)) AS gi FROM v) z),
        |bl AS (SELECT doc_id, (4*y//vh)*4 + (4*x//vw) AS bi,
        |         CAST(SUM(bv) AS BIGINT) AS bs,
        |         CAST(COUNT(*) AS BIGINT) AS bc
        |       FROM px GROUP BY 1, 2),
        |tt AS (SELECT doc_id, SUM(bs) AS tot, SUM(bc) AS n FROM bl
        |       GROUP BY 1),
        |hs AS (SELECT bl.doc_id,
        |         CAST(SUM(CASE WHEN bl.bs * tt.n > tt.tot * bl.bc
        |           THEN CAST(1 AS BIGINT) << CAST(bl.bi AS INT)
        |           ELSE 0 END) AS BIGINT) AS ahash,
        |         CAST(COUNT(*) AS INT) AS n_blocks
        |       FROM bl JOIN tt USING (doc_id) GROUP BY bl.doc_id),
        |bd AS (SELECT doc_id, ahash, 0 AS band, ahash % 256 AS bv FROM hs
        |       UNION ALL
        |       SELECT doc_id, ahash, 1, ahash // 256 FROM hs),
        |cp AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
        |         a.ahash AS ha, b.ahash AS hb
        |       FROM bd a JOIN bd b
        |         ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
        |np AS (SELECT da, db FROM cp WHERE bit_count(xor(ha, hb)) <= 1),
        |sy AS (SELECT da AS doc_id, db AS partner FROM np
        |       UNION ALL SELECT db, da FROM np),
        |ns AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_near,
        |         CAST(MIN(partner) AS BIGINT) AS nearest FROM sy GROUP BY 1)
        |SELECT h.doc_id, h.ahash, h.n_blocks,
        |       COALESCE(ns.n_near, 0) AS n_near,
        |       COALESCE(ns.nearest, -1) AS nearest_id
        |FROM hs h LEFT JOIN ns ON h.doc_id = ns.doc_id
        |ORDER BY h.doc_id""".stripMargin,
    // Audio energy-fingerprint near-dup: the oracle replays the WAV
    // payload arithmetic (q127's model — samples are text bytes
    // zero-padded to channel alignment, channel 0 = indices ≡ 0 mod
    // ch), windows the stream 16 ways by the exact integer split
    // 16·j//n, thresholds window energy by the integer cross-multiply,
    // and mirrors the two 8-bit-band candidate join + hamming verify —
    // value-checking the engine's RIFF parse + fingerprint + banded
    // join end to end. Same ASCII assumption as q295 (code point ==
    // UTF-8 byte on this fixture).
    // Video temporal near-dup: the oracle replays the GIF payload
    // arithmetic for EVERY frame (pixel k of the concatenated stream =
    // text byte k mod len, & 0x7f; frame f owns global indices
    // f·d..(f+1)·d−1 with d = vw·vh), rebuilds each frame's aHash via
    // the q295 block arithmetic, folds the brightness and aHash-popcount
    // envelopes over 8 temporal windows (16·… replaced by the 8-window
    // frame split 8·f//nf), and mirrors the FOUR 8-bit-band candidate
    // join + hamming-≤1 verify — value-checking the engine's full
    // multi-frame LZW decode + spatio-temporal fingerprint + banded
    // join end to end. Same ASCII assumption as q295/q306 (guarded by
    // Verify's fixture assertion).
    "q312_video_near_dup" ->
      """WITH v AS (SELECT doc_id, text,
        |             CAST(1 + doc_id % 32 AS INT) AS vw,
        |             CAST(1 + (doc_id*3) % 32 AS INT) AS vh,
        |             CAST(1 + doc_id % 10 AS INT) AS nf,
        |             length(text) AS len
        |           FROM documents WHERE doc_id % 3 = 2),
        |px AS (SELECT doc_id, vw, vh, nf,
        |         CAST(gi // (vw*vh) AS INT) AS f,
        |         CAST((gi % (vw*vh)) % vw AS INT) AS x,
        |         CAST((gi % (vw*vh)) // vw AS INT) AS y,
        |         CASE WHEN len = 0 THEN 0
        |           ELSE ord(substr(text, CAST((gi % len) + 1 AS INT), 1)) % 128
        |           END AS bv
        |       FROM (SELECT doc_id, text, vw, vh, nf, len,
        |               unnest(range(CAST(vw AS BIGINT)*vh*nf)) AS gi
        |             FROM v) z),
        |bl AS (SELECT doc_id, f, (4*y//vh)*4 + (4*x//vw) AS bi,
        |         CAST(SUM(bv) AS BIGINT) AS bs,
        |         CAST(COUNT(*) AS BIGINT) AS bc
        |       FROM px GROUP BY 1, 2, 3),
        |ft AS (SELECT doc_id, f, SUM(bs) AS tot, SUM(bc) AS d
        |       FROM bl GROUP BY 1, 2),
        |fh AS (SELECT bl.doc_id, bl.f,
        |         CAST(SUM(CASE WHEN bl.bs * ft.d > ft.tot * bl.bc
        |           THEN CAST(1 AS BIGINT) << CAST(bl.bi AS INT)
        |           ELSE 0 END) AS BIGINT) AS fhash,
        |         MAX(ft.tot) AS fsum
        |       FROM bl JOIN ft USING (doc_id, f) GROUP BY 1, 2),
        |tw AS (SELECT fh.doc_id, fh.f, fh.fhash, fh.fsum, v.nf,
        |         CAST(8*fh.f // v.nf AS INT) AS wi,
        |         CAST(bit_count(fh.fhash) AS BIGINT) AS fpop
        |       FROM fh JOIN v USING (doc_id)),
        |wl AS (SELECT doc_id, wi, SUM(fsum) AS ws, SUM(fpop) AS wp,
        |         CAST(COUNT(*) AS BIGINT) AS wc, MAX(nf) AS nf
        |       FROM tw GROUP BY 1, 2),
        |tt AS (SELECT doc_id, SUM(ws) AS ts, SUM(wp) AS tp
        |       FROM wl GROUP BY 1),
        |tb AS (SELECT wl.doc_id,
        |         CAST(SUM((CASE WHEN wl.ws * wl.nf > tt.ts * wl.wc
        |             THEN CAST(1 AS BIGINT) << (16 + wl.wi) ELSE 0 END)
        |           + (CASE WHEN wl.wp * wl.nf > tt.tp * wl.wc
        |             THEN CAST(1 AS BIGINT) << (24 + wl.wi) ELSE 0 END))
        |           AS BIGINT) AS tbits
        |       FROM wl JOIN tt USING (doc_id) GROUP BY 1),
        |hs AS (SELECT fh.doc_id, fh.fhash + tb.tbits AS vfp,
        |         CAST(v.nf AS INT) AS n_frames
        |       FROM fh JOIN tb USING (doc_id) JOIN v USING (doc_id)
        |       WHERE fh.f = 0),
        |bd AS (SELECT doc_id, vfp, 0 AS band, vfp % 256 AS bv FROM hs
        |       UNION ALL
        |       SELECT doc_id, vfp, 1, (vfp // 256) % 256 FROM hs
        |       UNION ALL
        |       SELECT doc_id, vfp, 2, (vfp // 65536) % 256 FROM hs
        |       UNION ALL
        |       SELECT doc_id, vfp, 3, vfp // 16777216 FROM hs),
        |cp AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
        |         a.vfp AS va, b.vfp AS vb
        |       FROM bd a JOIN bd b
        |         ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
        |np AS (SELECT da, db FROM cp WHERE bit_count(xor(va, vb)) <= 1),
        |sy AS (SELECT da AS doc_id, db AS partner FROM np
        |       UNION ALL SELECT db, da FROM np),
        |ns AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_near,
        |         CAST(MIN(partner) AS BIGINT) AS nearest FROM sy GROUP BY 1)
        |SELECT h.doc_id, h.vfp, h.n_frames,
        |       COALESCE(ns.n_near, 0) AS n_near,
        |       COALESCE(ns.nearest, -1) AS nearest_id
        |FROM hs h LEFT JOIN ns ON h.doc_id = ns.doc_id
        |ORDER BY h.doc_id""".stripMargin,

    "q306_audio_near_dup" ->
      """WITH a AS (SELECT doc_id, text,
        |             CAST(1 + doc_id % 2 AS INT) AS ch,
        |             length(text) AS len
        |           FROM documents WHERE doc_id % 3 = 1),
        |d AS (SELECT doc_id, ch, len, text,
        |        len + CASE WHEN len % ch = 0 THEN 0 ELSE 1 END AS dlen
        |      FROM a),
        |s AS (SELECT doc_id, gi // ch AS j, n,
        |        (CASE WHEN gi < len
        |              THEN ord(substr(text, CAST(gi + 1 AS INT), 1))
        |              ELSE 0 END) - 128 AS amp
        |      FROM (SELECT doc_id, ch, len, text, dlen // ch AS n,
        |              unnest(range(dlen)) AS gi FROM d WHERE dlen > 0) z
        |      WHERE gi % ch = 0),
        |wl AS (SELECT doc_id, n, CAST(16*j // n AS INT) AS wi,
        |         CAST(SUM(amp*amp) AS BIGINT) AS wss,
        |         CAST(COUNT(*) AS BIGINT) AS wn
        |       FROM s GROUP BY 1, 2, 3),
        |tt AS (SELECT doc_id, SUM(wss) AS tot FROM wl GROUP BY 1),
        |hs AS (SELECT wl.doc_id,
        |         CAST(SUM(CASE WHEN wl.wss * wl.n > tt.tot * wl.wn
        |           THEN CAST(1 AS BIGINT) << wl.wi
        |           ELSE 0 END) AS BIGINT) AS fp,
        |         CAST(COUNT(*) AS INT) AS n_windows,
        |         CAST(MAX(wl.n) AS BIGINT) AS n_samples
        |       FROM wl JOIN tt USING (doc_id) GROUP BY wl.doc_id),
        |bd AS (SELECT doc_id, fp, 0 AS band, fp % 256 AS bv FROM hs
        |       UNION ALL
        |       SELECT doc_id, fp, 1, fp // 256 FROM hs),
        |cp AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
        |         a.fp AS fa, b.fp AS fb
        |       FROM bd a JOIN bd b
        |         ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
        |np AS (SELECT da, db FROM cp WHERE bit_count(xor(fa, fb)) <= 1),
        |sy AS (SELECT da AS doc_id, db AS partner FROM np
        |       UNION ALL SELECT db, da FROM np),
        |ns AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_near,
        |         CAST(MIN(partner) AS BIGINT) AS nearest FROM sy GROUP BY 1)
        |SELECT h.doc_id, h.fp, h.n_windows, h.n_samples,
        |       COALESCE(ns.n_near, 0) AS n_near,
        |       COALESCE(ns.nearest, -1) AS nearest_id
        |FROM hs h LEFT JOIN ns ON h.doc_id = ns.doc_id
        |ORDER BY h.doc_id""".stripMargin,
  )
}
