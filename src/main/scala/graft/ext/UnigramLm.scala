package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** UNIGRAM-LM (SentencePiece-style) tokenizer — the second tokenizer
  * lineage next to BPE (q232/q237/q238): Kudo 2018's subword
  * regularization model, trained by EM with vocabulary pruning. Where
  * BPE GROWS a vocabulary by greedy merges, unigram-LM starts from an
  * over-complete candidate set and PRUNES it: score candidates, Viterbi-
  * segment the vocabulary under the current piece scores (the hard-EM
  * E-step), re-estimate scores from the usage counts (M-step), drop the
  * pieces the segmentation never uses, repeat. This implementation runs
  * the fixed-round form of that loop (the q223/q236 fixed-round oracle
  * contract — both engines unroll the identical rounds):
  *
  *   1. seed   — candidate pieces = all substrings of vocabulary words
  *               up to `maxPieceLen` chars: every single char (never
  *               prunable — the segmentability guarantee) plus the top
  *               `seedMulti` multi-char substrings by corpus-weighted
  *               occurrence count;
  *   2. E-step — Viterbi-segment every vocabulary word under piece
  *               costs −ln P(piece), P = (c+1)/(T+V) (add-one keeps
  *               every kept piece finite);
  *   3. prune  — multi-char pieces the Viterbi paths USED (weighted
  *               usage ≥ 1), top `keepMulti` by (usage desc, piece);
  *               a high-substring-count candidate with zero usage dies
  *               here — the EM point;
  *   4. E-step — re-segment under scores re-estimated from usage (the
  *               M-step), yielding the final per-word piece counts.
  *
  * Everything is exact-integer oracle-checkable: piece costs quantize
  * ONCE per piece to micro-nats over identical rational doubles (the
  * q181 idiom), the Viterbi DP minimizes integer (cost, n_pieces,
  * piece) lexicographically — a total order, so both engines pick the
  * identical cell winner — and the readout is floor-division fixed
  * point.
  *
  * Scale shape — the q232 argument verbatim: ALL training work is
  * VOCABULARY-sized (distinct alpha words ≤ `maxWordLen` chars,
  * weighted by corpus frequency), never corpus-sized. The DP is
  * `maxWordLen` unrolled steps, each one join of the word relation
  * against the BROADCAST piece table with a per-word argmin
  * (localCheckpoint per step — fixed plans, no exponential lineage);
  * the backtrack is ≤ `maxWordLen` joins against the staged DP table.
  * The corpus pays exactly ONE broadcast (word → piece count) join —
  * the q238 serving shape.
  */
object UnigramLm {
  import TextOps._

  /** Viterbi DP over (w, len) words with BROADCAST piece costs
    * (piece, lp): returns the full cell table (pos, w, len, cost, np,
    * piece, prev) where row (p, w) is the best segmentation of w's
    * first p chars — winner by lexicographic (cost, np, piece), ties
    * impossible beyond that (piece fixes prev). */
  private def viterbi(wl: DataFrame, vp: DataFrame, maxWordLen: Int,
                      maxPieceLen: Int): DataFrame = {
    var dpByPos = Map(0 -> wl.select(col("w"), col("len"),
      lit(0L).as("cost"), lit(0).as("np"), lit("").as("piece"),
      lit(0).as("prev")))
    for (p <- 1 to maxWordLen) {
      val cands = (1 to math.min(maxPieceLen, p)).map { l =>
        dpByPos(p - l).filter(col("len") >= p)
          .withColumn("pc", substring(col("w"), p - l + 1, l))
          .join(broadcast(vp), col("pc") === vp("piece"))
          .select(col("w"), col("len"), (col("cost") + col("lp")).as("cost"),
            (col("np") + 1).as("np"), vp("piece").as("piece"),
            lit(p - l).as("prev"))
      }
      val best = cands.reduce(_ unionAll _)
        .groupBy("w")
        .agg(min_by(struct(col("len"), col("cost"), col("np"), col("piece"),
          col("prev")), struct(col("cost"), col("np"), col("piece")))
          .as("c"))
        .select(col("w"), col("c.len").as("len"), col("c.cost").as("cost"),
          col("c.np").as("np"), col("c.piece").as("piece"),
          col("c.prev").as("prev"))
        .localCheckpoint() // per-step lineage cut (cells feed ≤4 later steps)
      dpByPos = dpByPos + (p -> best)
    }
    (1 to maxWordLen).map { p =>
      dpByPos(p).select(lit(p).as("pos"), col("w"), col("len"), col("cost"),
        col("np"), col("piece"), col("prev"))
    }.reduce(_ unionAll _).localCheckpoint() // read by backtrack ×11 + finals
  }

  /** Walk the Viterbi paths backward from each word's final cell,
    * emitting one (w, piece) row per used piece occurrence. */
  private def viterbiUses(dpAll: DataFrame, maxWordLen: Int): DataFrame = {
    var cur = dpAll.filter(col("pos") === col("len"))
      .select(col("w"), col("piece"), col("prev"))
    var uses = cur.select("w", "piece")
    for (_ <- 2 to maxWordLen) {
      cur = cur.filter(col("prev") > 0)
        .select(col("w"), col("prev").as("pos"))
        .join(dpAll.select("pos", "w", "piece", "prev"), Seq("w", "pos"))
        .select(col("w"), col("piece"), col("prev"))
      uses = uses.unionAll(cur.select("w", "piece"))
    }
    uses
  }

  /** −ln((c+1)/(T+V)) in micro-nats — ONE transcendental per piece,
    * identical rational-double operands on both engines. */
  private def lpCol(cnt: String): org.apache.spark.sql.Column =
    round(log((col("tt") + col("vv")) / (col(cnt) + lit(1.0))) * 1e6, 0)
      .cast("long")

  /** The shared training state: (vocab words with freq, seed piece set
    * with substring counts, round-1 usage, pruned piece set with usage,
    * final per-word piece counts). Exposed private[ext] for the
    * hand-replay spec. */
  private[ext] def trainState(docs: DataFrame, textCol: String,
                              seedMulti: Int, keepMulti: Int,
                              maxWordLen: Int, maxPieceLen: Int)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val vw = docs
      .select(explode(tokens(normText(col(textCol)))).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= maxWordLen)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .localCheckpoint() // read by substring counts, usage weights, DP base
    val wl = vw.select(col("w"), length(col("w")).cast("int").as("len"))
    // corpus-weighted substring occurrence counts, lengths 1..maxPieceLen
    val occ = (1 to maxPieceLen).map { l =>
      vw.filter(length(col("w")) >= l)
        .select(col("freq"), explode(expr(
          s"transform(sequence(1, length(w) - ${l - 1}), i -> substring(w, i, $l))"))
          .as("piece"))
    }.reduce(_ unionAll _)
      .groupBy("piece").agg(sum("freq").as("c0"))
      .localCheckpoint() // read by the char slice + the multi top-k
    val chars = occ.filter(length(col("piece")) === 1)
    val multi = occ.filter(length(col("piece")) >= 2)
      .orderBy(desc("c0"), col("piece")).limit(seedMulti)
    val v0 = chars.unionAll(multi).localCheckpoint() // vp0 + prune spine + count
    val t0 = v0.agg(sum("c0").as("tt"), count(lit(1)).as("vv"))
    val vp0 = v0.crossJoin(broadcast(t0))
      .select(col("piece"), lpCol("c0").as("lp"))
    val dpA = viterbi(wl, vp0, maxWordLen, maxPieceLen)
    val u1 = viterbiUses(dpA, maxWordLen)
      .join(vw, Seq("w"))
      .groupBy("piece").agg(sum("freq").as("u1"))
      .localCheckpoint() // read by both prune slices
    val keptChars = v0.filter(length(col("piece")) === 1)
      .join(u1, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("u1"), lit(0L)).as("u1"))
    val keptMulti = v0.filter(length(col("piece")) >= 2)
      .join(u1, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("u1"), lit(0L)).as("u1"))
      .filter(col("u1") >= 1)
      .orderBy(desc("u1"), col("piece")).limit(keepMulti)
    val v1 = keptChars.unionAll(keptMulti).localCheckpoint() // vp1 + count
    val t1 = v1.agg(sum("u1").as("tt"), count(lit(1)).as("vv"))
    val vp1 = v1.crossJoin(broadcast(t1))
      .select(col("piece"), lpCol("u1").as("lp"))
    val dpB = viterbi(wl, vp1, maxWordLen, maxPieceLen)
    val npFinal = dpB.filter(col("pos") === col("len"))
      .select(col("w"), col("np"))
    (vw, v0, u1, v1, npFinal)
  }

  /** The q284 readout: per-source fertility under the EM-pruned
    * unigram-LM vocabulary — the q238 corpus-application shape (one
    * broadcast word→pieces join; non-vocabulary words pass through as
    * one piece each) plus the vocabulary sizes before/after the prune
    * so the EM round's effect is visible in the row itself. */
  def fertilityBySource(docs: DataFrame, srcCol: String, textCol: String,
                        seedMulti: Int = 48, keepMulti: Int = 32,
                        maxWordLen: Int = 12,
                        maxPieceLen: Int = 4): DataFrame = {
    require(seedMulti >= keepMulti && maxPieceLen >= 1 && maxWordLen >= 1,
      s"bad params: $seedMulti/$keepMulti/$maxWordLen/$maxPieceLen")
    val (_, v0, _, v1, npFinal) =
      trainState(docs, textCol, seedMulti, keepMulti, maxWordLen, maxPieceLen)
    val nV0 = v0.agg(count(lit(1)).as("vocab_initial"))
    val nV1 = v1.agg(count(lit(1)).as("vocab_final"))
    docs.select(col(srcCol).as("source"),
        explode(tokens(normText(col(textCol)))).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(npFinal), Seq("w"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("np").isNotNull, 1L).otherwise(0L)).as("n_seg_words"),
        sum(coalesce(col("np").cast("long"), lit(1L))).as("total_pieces"),
        sum(length(col("w")).cast("long")).as("total_chars"))
      .crossJoin(broadcast(nV0)).crossJoin(broadcast(nV1))
      .select(col("source"), col("n_words").cast("long").as("n_words"),
        col("n_seg_words").cast("long").as("n_seg_words"),
        col("total_pieces").cast("long").as("total_pieces"),
        col("total_chars").cast("long").as("total_chars"),
        expr("total_pieces * 1000000 div n_words")
          .as("pieces_per_word_micro"),
        col("vocab_initial").cast("long").as("vocab_initial"),
        col("vocab_final").cast("long").as("vocab_final"))
      .orderBy("source")
  }
}
