package graft.ext

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def ks(a: Seq[Long], b: Seq[Long], ranges: Int = 0) =
    Drift.ksReport(a.toDF("v"), b.toDF("v"), "v", ranges = ranges)
      .collect().head

  test("identical distributions have zero KS distance") {
    val xs = Seq(1L, 2L, 2L, 3L, 9L, 9L, 9L)
    val r = ks(xs, xs)
    assert(r.getAs[Long]("ks_ppm") == 0L)
    assert(r.getAs[Long]("n_a") == 7L && r.getAs[Long]("n_b") == 7L)
    // all gaps are zero → argmax ties break to the smallest value
    assert(r.getAs[Long]("at_value") == 1L)
  }

  test("disjoint supports have KS distance 1 (1e6 ppm) at cohort A's max") {
    val r = ks(Seq(1L, 2L, 3L), Seq(10L, 11L))
    assert(r.getAs[Long]("ks_ppm") == 1000000L)
    // ECDF gap first reaches 1 once all of A is below all of B: at v=3
    assert(r.getAs[Long]("at_value") == 3L)
  }

  test("matches the brute-force definition on uneven random cohorts") {
    val rnd = new scala.util.Random(7)
    val a = Seq.fill(400)(rnd.nextInt(40).toLong)
    val b = Seq.fill(250)(rnd.nextInt(40).toLong + 5L)
    // brute force over the merged support, exact rational arithmetic
    val support = (a ++ b).distinct.sorted
    val gaps = support.map { v =>
      val d = math.abs(a.count(_ <= v).toLong * b.size -
        b.count(_ <= v).toLong * a.size)
      (d, v)
    }
    val (dmax, at) = gaps.maxBy { case (d, v) => (d, -v) }
    val expPpm = dmax * 1000000L / (a.size.toLong * b.size)
    for (ranges <- Seq(1, 4, 16)) {
      val r = ks(a, b, ranges)
      assert(r.getAs[Long]("ks_ppm") == expPpm, s"ranges=$ranges")
      assert(r.getAs[Long]("at_value") == at, s"ranges=$ranges")
    }
  }

  test("JSD: zero for identical mixes, ln2-bounded, ordered by divergence") {
    import spark.implicits._
    // s1 == s2 (identical unigram mix), s3 half-overlapping, s4 disjoint
    val docs = Seq(
      (1L, "a1", "aa bb aa bb"), (2L, "a2", "bb aa bb aa"),
      (3L, "b1", "aa aa cc cc"), (4L, "c1", "dd dd ee ee")
    ).toDF("doc_id", "source", "text")
    val rows = Drift.jsDivergenceMatrix(docs, "source", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("jsd_micro"))
      .toMap
    // identical distributions: exactly zero
    assert(rows(("a1", "a2")) == 0L)
    // the half-overlapping pair diverges, but less than ln 2
    assert(rows(("a1", "b1")) > 0L && rows(("a1", "b1")) < 693147L)
    assert(rows(("a1", "b1")) == rows(("a2", "b1"))) // symmetry via equal mixes
    // disjoint vocabularies share no term key: absent by contract
    assert(!rows.contains(("a1", "c1")) && !rows.contains(("b1", "c1")))
  }

  test("JSD hand value: (3/4,1/4) vs (1/4,3/4) within quantization of exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x", "aa aa aa bb"), (2L, "y", "aa bb bb bb")
    ).toDF("doc_id", "source", "text")
    val got = Drift.jsDivergenceMatrix(docs, "source", "text")
      .collect().head.getAs[Long]("jsd_micro")
    // JSD = ln2 + (3/4)ln(3/4) + (1/4)ln(1/4) ≈ 0.130812 nats
    val exact = math.log(2) + 0.75 * math.log(0.75) + 0.25 * math.log(0.25)
    assert(math.abs(got - math.round(exact * 1e6)) <= 2,
      s"got $got vs exact ${math.round(exact * 1e6)}")
  }

  test("embeddingDrift: identical halves report zero shift and zero PSI") {
    // every even/odd id pair carries the SAME vector — the reference
    // and current halves are identical distributions dim by dim
    val dim = 8
    def vec(s: Int): Array[Float] =
      (0 until dim).map(j => ((s * 7 + j * 3) % 11 - 5) / 10.0f).toArray
    val rows = (0 until 10).flatMap { s =>
      Seq((2L * s, vec(s)), (2L * s + 1, vec(s)))
    }
    val out = Drift.embeddingDrift(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding").collect()
    assert(out.length == dim)
    out.foreach { r =>
      assert(r.getAs[Long]("n_ref") == 10L && r.getAs[Long]("n_cur") == 10L)
      assert(r.getAs[Long]("shift_e6") == 0L, s"dim ${r.getInt(0)} shift")
      assert(r.getAs[Long]("psi_micro") == 0L, s"dim ${r.getInt(0)} psi")
    }
  }

  test("embeddingDrift: a planted dim-0 shift is localized and measured") {
    val dim = 4
    def vec(d0: Float): Array[Float] = Array(d0, 0.1f, -0.2f, 0.3f)
    val rows = (0 until 20).flatMap { s =>
      Seq((2L * s, vec(0.0f)),       // reference half: dim0 = 0.0
        (2L * s + 1, vec(0.5f)))     // current half:   dim0 = 0.5
    }
    val byDim = Drift.embeddingDrift(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("shift_e6"), r.getAs[Long]("psi_micro"))).toMap
    // dim 0 shifted by exactly 0.5 → 500000 e6 units; its bins are
    // disjoint so the smoothed PSI is large; dims 1..3 are untouched
    assert(byDim(0)._1 == 500000L)
    assert(byDim(0)._2 > 0L)
    (1 until dim).foreach { d =>
      assert(byDim(d) == ((0L, 0L)), s"dim $d should be drift-free")
    }
  }
}
