package graft.functions

import graft.SparkSpec
import graft.ext.TextOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** The native text kernels must be value-identical to the HOF
  * formulation they replace (`hash8` over `charShingles` /
  * `wordShingles` + `rpad`) — the DuckDB oracle mirrors the HOF math, so
  * any divergence here is an oracle break. Checked property-style over
  * random normalized strings plus the edge shapes (empty, shorter than
  * k, single token).
  */
class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val word = Gen.choose(1, 12).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val normish = Gen.choose(0, 40).flatMap(n =>
    Gen.listOfN(n, word).map(_.mkString(" ")))

  private def viaHof(texts: Seq[String], c: org.apache.spark.sql.Column): Map[String, Seq[Long]] =
    texts.toDF("t").select(col("t"), c.as("hs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

  test("shingle_hashes == hash8 over charShingles (random + edges)") {
    val samples = Seq("", "a", "abcdefg", "abcdefgh", "abcdefghi",
      "the quick brown fox", "aaaaaaaaaaaaaaaa") ++
      Gen.listOfN(40, normish).sample.getOrElse(Seq.empty)
    val kernel = viaHof(samples,
      TextKernelOps.shingleHashes(col("t"), 8))
    val hof = viaHof(samples,
      transform(TextOps.charShingles(col("t"), 8), s => TextOps.hash8(s)))
    samples.foreach { t => assert(kernel(t) == hof(t), s"mismatch for '$t'") }
  }

  test("word_ngram_hash8 == hash8(rpad(wordShingles, 8)) (random + edges)") {
    val samples = Seq("one", "one two", "one two three", "ab cd ef",
      "exactly8 chars", "a b c d e f g") ++
      Gen.listOfN(40, normish).sample.getOrElse(Seq.empty).filter(_.nonEmpty)
    Seq(2, 3).foreach { n =>
      val kernel = viaHof(samples,
        TextKernelOps.wordNgramHash8(col("t"), n))
      val hof = viaHof(samples,
        transform(TextOps.wordShingles(TextOps.tokens(col("t")), n),
          s => TextOps.hash8(rpad(s, 8, " "))))
      samples.foreach { t => assert(kernel(t) == hof(t), s"mismatch for '$t' n=$n") }
    }
  }

  test("word_ngram_hash_full == 31-Horner over each n-gram's chars") {
    def scalaHash(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31L + c.toInt) % TextOps.HashP)
    val samples = Seq("one", "one two", "one two three", "a b c d e f g") ++
      Gen.listOfN(40, normish).sample.getOrElse(Seq.empty).filter(_.nonEmpty)
    Seq(2, 3).foreach { n =>
      val kernel = samples.toDF("t")
        .select(col("t"), TextKernelOps.wordNgramHashFull(col("t"), n).as("h"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val expected = samples.toDF("t")
        .select(col("t"), TextOps.wordShingles(TextOps.tokens(col("t")), n).as("g"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).map(scalaHash)).toMap
      samples.foreach { t => assert(kernel(t) == expected(t), s"mismatch for '$t' n=$n") }
    }
  }

  test("word_ngrams == wordShingles over tokens (random + edges)") {
    val samples = Seq("one", "one two", "one two three", "a b c d e f g") ++
      Gen.listOfN(40, normish).sample.getOrElse(Seq.empty).filter(_.nonEmpty)
    Seq(2, 3).foreach { n =>
      val kernel = samples.toDF("t")
        .select(col("t"), TextKernelOps.wordNgrams(col("t"), n).as("g"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      val hof = samples.toDF("t")
        .select(col("t"), TextOps.wordShingles(TextOps.tokens(col("t")), n).as("g"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      samples.foreach { t => assert(kernel(t) == hof(t), s"mismatch for '$t' n=$n") }
    }
  }

  test("kernels are registered as SQL functions via GraftExtensions") {
    val row = spark.sql(
      """SELECT size(shingle_hashes('abcdefghij', 8)) AS a,
        |       size(word_ngrams('one two three', 2)) AS b,
        |       size(word_ngram_hash_full('one two three', 3)) AS c
        |""".stripMargin).collect()(0)
    assert(row.getInt(0) == 3 && row.getInt(1) == 2 && row.getInt(2) == 1)
  }

  test("kernels run inside whole-stage codegen") {
    val df = Seq("the quick brown fox jumps").toDF("t")
      .select(explode(TextKernelOps.shingleHashes(col("t"), 8)).as("hv"))
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark operators inside a WholeStageCodegen stage.
    assert(plan.contains("*(1) Generate explode(shingle_hashes"),
      s"kernel not in a codegen stage:\n$plan")
    assert(df.count() > 0)
  }
}
