package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding SEGMENTATION under an ordered merge list — the
  * tokenize-under-a-fixed-vocab step every training-data pipeline runs
  * on 100% of its corpus (Sennrich–Haddow–Birch 2016). The suite
  * already measures merge-candidate *statistics* (q77's pair table) and
  * a fertility *proxy* (q112's BPE-ish regex pieces); this operator
  * actually APPLIES merges: `rounds` fixed merge rounds (the q223/q228
  * fixed-round oracle contract — both engines run the same R rounds,
  * the oracle unrolls them as CTEs), where round r picks the current
  * highest-frequency adjacent symbol pair (corpus-frequency-weighted,
  * ties by pair text) and merges its non-overlapping occurrences
  * LEFTMOST-FIRST in every vocabulary word — exactly the reference BPE
  * trainer's greedy application order.
  *
  * The relational form of "merge leftmost-first, non-overlapping" is
  * the run trick: among CONSECUTIVE matching positions (overlapping
  * occurrences share a symbol — "aaa" matches (a,a) at 0 and 1), a
  * match applies iff its offset within the run is even, which is
  * computed with two keyed windows (a running match count splits runs:
  * distinct runs get distinct `pos − running_count`; the run minimum
  * anchors the offset) — no recursion, no per-row loop.
  *
  * Scale shape — the reason BPE fits a 100 TB engine at all: merges run
  * over the VOCABULARY (distinct words weighted by corpus frequency),
  * never the corpus. The symbol relation is |vocab|·word-length rows;
  * every window is keyed by the word (high-cardinality, bounded per-key
  * state = word length); the per-round pair-statistics aggregation
  * collapses to |symbol-pairs| rows and the argmax is a 1-row
  * TakeOrdered broadcast. Applying the result corpus-wide is one
  * broadcast join of the (word → segmentation) map onto the token
  * stream — the `corpus_pieces` column already carries that weighted
  * readout. Per-round lineage is cut (localCheckpoint) so R rounds
  * never grow the plan.
  */
object Bpe {
  import TextOps._

  /** Top-`topWords` vocabulary words (by corpus frequency, ties by
    * word) with their segmentation after `rounds` BPE merge rounds:
    * (word, freq, n_chars, n_pieces, corpus_pieces, segmentation) —
    * `corpus_pieces` = freq·n_pieces, the corpus-weighted token cost
    * of this word under the learned merges. */
  def bpeSegment(docs: DataFrame, idCol: String, textCol: String,
                 rounds: Int = 6, topWords: Int = 40): DataFrame = {
    require(rounds >= 1, s"need >= 1 merge round, got $rounds")
    val vocab = docs
      .select(explode(tokens(normText(col(textCol)))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .localCheckpoint() // read every round (pair weights) + final report
    val pw = Window.partitionBy("w").orderBy("pos")
    var st = vocab
      .select(col("w"), posexplode(
        expr("transform(sequence(0, length(w)-1), i -> substring(w, i+1, 1))"))
        .as(Seq("pos", "sym")))
    for (_ <- 1 to rounds) {
      val withNext = st
        .withColumn("nxt", lead("sym", 1).over(pw))
        .localCheckpoint() // read 2x: pair stats + merge application
      val best = withNext.filter(col("nxt").isNotNull)
        .join(vocab, Seq("w"))
        .groupBy(col("sym").as("a"), col("nxt").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(1)
        .select(col("a"), col("b"))
      st = withNext.crossJoin(broadcast(best))
        // coalesce: the last position's nxt is NULL, which would make
        // is_match NULL (not false) when sym = a — pin it false on both
        // engines so the window arithmetic below never sees NULL.
        .withColumn("is_match",
          coalesce(col("sym") === col("a") && col("nxt") === col("b"),
            lit(false)))
        .withColumn("mk",
          sum(when(col("is_match"), 1).otherwise(0)).over(pw))
        .withColumn("grp", col("pos") - col("mk"))
        .withColumn("rs",
          min(when(col("is_match"), col("pos")))
            .over(Window.partitionBy("w", "grp")))
        .withColumn("applied",
          col("is_match") && (col("pos") - col("rs")) % 2 === 0)
        .withColumn("absorbed",
          coalesce(lag("applied", 1).over(pw), lit(false)))
        .filter(!col("absorbed"))
        .select(col("w"), col("pos").as("opos"),
          when(col("applied"), concat(col("sym"), col("nxt")))
            .otherwise(col("sym")).as("sym"))
        .withColumn("pos",
          row_number().over(Window.partitionBy("w").orderBy("opos")) - 1)
        .select("w", "pos", "sym")
    }
    val seg = st.groupBy("w").agg(
      count(lit(1)).as("n_pieces"),
      concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("sym")))),
        x => x.getField("sym"))).as("segmentation"))
    vocab.join(seg, Seq("w"))
      .select(col("w").as("word"), col("freq"),
        length(col("w")).cast("long").as("n_chars"),
        col("n_pieces").cast("long").as("n_pieces"),
        (col("freq") * col("n_pieces")).cast("long").as("corpus_pieces"),
        col("segmentation"))
      .orderBy(desc("freq"), col("word"))
      .limit(topWords)
  }
}
