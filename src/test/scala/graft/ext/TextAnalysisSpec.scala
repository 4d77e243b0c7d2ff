package graft.ext

import graft.SparkSpec

/** Text analysis: token counting, quality scoring, language-ID heuristic,
  * and fingerprint stability.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenStats counts whitespace and BPE-ish tokens") {
    val df = Seq((1L, "Hello world, it's 42!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenStats(df, "doc_id", "text").collect()(0)
    assert(r.getInt(1) == 4)                   // hello / world, / it's / 42!
    // bpe-ish: hello world , it ' s 4 2 !  → 9
    assert(r.getInt(2) == 9)
  }

  test("qualityScore computes ratios and gates on stopword presence") {
    val good = (1 to 6).map(_ => "the cat sat on a mat").mkString(" ") // 36 tokens
    val bad = "x y z !!! ???"
    val df = Seq((1L, good), (2L, bad)).toDF("doc_id", "text")
    val rows = TextAnalysis.qualityScore(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows(0).getAs[Int]("is_quality") == 1)
    assert(rows(1).getAs[Int]("is_quality") == 0)
    assert(rows(0).getAs[Long]("n_tokens") == 36)
    assert(rows(1).getAs[Double]("punct_ratio") > 0.3)
  }

  test("languageId scores marker tokens and predicts with fixed tie order") {
    val df = Seq(
      (1L, "the house of and cards"),
      (2L, "der hund und die katze ist"),
      (3L, "xyzzy plugh")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.languageId(df, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getAs[String]("predicted_lang"))
    assert(out.toSeq == Seq("en", "de", "und"))
  }

  test("fingerprint is identical for normalization-equal texts, differs otherwise") {
    val df = Seq(
      (1L, "some document text here padded to shingle length"),
      (2L, "  SOME   Document TEXT here padded to shingle length "),
      (3L, "entirely different words occupy this other document")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }
}
