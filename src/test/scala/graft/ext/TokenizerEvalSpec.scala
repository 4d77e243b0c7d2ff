package graft.ext

import graft.SparkSpec

class TokenizerEvalSpec extends SparkSpec {

  test("fertility matrix: 3 lineages x 5 languages, coherent integer readouts") {
    val rows = graft.queries.TextQueries.tokenizerFertility(spark, sf001)
      .collect()
    val byLineage = rows.groupBy(_.getAs[String]("lineage"))
    assert(byLineage.keySet == Set("bpe", "unigram", "wordpiece"))
    byLineage.values.foreach(ls =>
      assert(ls.map(_.getAs[String]("lang")).toSet ==
        Set("en", "zh", "fr", "de", "es")))
    rows.foreach { r =>
      val nWords = r.getAs[Long]("n_words")
      val covered = r.getAs[Long]("covered_words")
      val pieces = r.getAs[Long]("total_pieces")
      val chars = r.getAs[Long]("total_chars")
      assert(nWords > 0 && covered > 0 && covered <= nWords, r.toString)
      // ≥ 1 piece per word, ≤ word-length pieces per covered word
      assert(pieces >= nWords && pieces <= chars + (nWords - covered),
        r.toString)
      assert(r.getAs[Long]("tokens_per_word_micro") ==
        pieces * 1000000L / nWords)
      assert(r.getAs[Long]("bytes_per_token_micro") ==
        chars * 1000000L / pieces)
    }
    // a language-agnostic sanity: every lineage's corpus-wide fertility
    // is at least 1.0 and at most the mean word length
    byLineage.foreach { case (lin, ls) =>
      val pieces = ls.map(_.getAs[Long]("total_pieces")).sum
      val words = ls.map(_.getAs[Long]("n_words")).sum
      val chars = ls.map(_.getAs[Long]("total_chars")).sum
      assert(pieces >= words && pieces <= chars,
        s"$lin fertility out of [1, mean-word-len]")
    }
  }

  test("equal budget: six merges make BPE fertility strictly below the char baseline") {
    // with zero learned units every alpha word splits to characters;
    // 6 merges must strictly reduce the corpus piece volume
    val docs = graft.model.Tables.documents(spark, sf001)
    val np6 = Bpe.pieceCounts(docs, "text", rounds = 6)
    val stats = np6.join(
        docs.select(org.apache.spark.sql.functions.explode(
          TextOps.tokens(TextOps.normText(
            org.apache.spark.sql.functions.col("text")))).as("w"))
          .groupBy("w").count(), Seq("w"))
      .selectExpr("sum(np * count) AS pieces", "sum(length(w) * count) AS chars")
      .collect().head
    assert(stats.getLong(0) < stats.getLong(1),
      "6 merges did not compress below the character baseline")
  }
}
