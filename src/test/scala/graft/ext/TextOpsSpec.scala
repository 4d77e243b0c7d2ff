package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Text primitives: normalization, shingling, integer hashing. Property
  * cases (via ScalaCheck generators, evaluated in one batch) cover the
  * invariants oracle parity depends on: hash range, shingle counts,
  * normalization idempotence.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def normAll(ss: Seq[String]): Seq[String] =
    ss.toDF("t").select(TextOps.normText(col("t"))).as[String].collect().toSeq

  test("normText collapses whitespace, trims, lowercases") {
    assert(normAll(Seq("  Hello   World\tfoo\n")) == Seq("hello world foo"))
  }

  test("normText is idempotent on generated strings") {
    val samples = Gen.listOfN(60, Gen.asciiPrintableStr).sample.get :+
      " \t mixed \n WS  " :+ ""
    val once = normAll(samples)
    assert(normAll(once) == once)
  }

  test("hash8 stays in [0, 2^31-1) and is deterministic") {
    val gen = Gen.listOfN(8, Gen.asciiPrintableChar).map(_.mkString)
    val samples = Gen.listOfN(100, gen).sample.get
    val vals = samples.toDF("s").select(TextOps.hash8(col("s")).as("h"))
      .as[Long].collect()
    assert(vals.forall(h => h >= 0 && h < TextOps.HashP))
    val again = samples.toDF("s").select(TextOps.hash8(col("s")).as("h"))
      .as[Long].collect()
    assert(vals.toSeq == again.toSeq)
  }

  test("hash8 matches the explicit polynomial definition") {
    val s = "abcdefgh"
    val expected = s.zip(TextOps.Pow31).map { case (c, w) => c.toLong * w }
      .sum % TextOps.HashP
    val got = Seq(s).toDF("s").select(TextOps.hash8(col("s"))).as[Long].collect()(0)
    assert(got == expected)
  }

  test("charShingles yields len-k+1 shingles; short text yields none") {
    val out = Seq("abcdefghij", "short").toDF("t")
      .select(size(TextOps.charShingles(col("t"), 8)).as("n")).as[Int].collect()
    assert(out.toSeq == Seq(3, 0))
  }

  test("wordShingles builds space-joined n-grams in order") {
    val out = Seq("a b c d").toDF("t")
      .select(TextOps.wordShingles(TextOps.tokens(col("t")), 3).as("sh"))
      .as[Seq[String]].collect()(0)
    assert(out == Seq("a b c", "b c d"))
  }
}
