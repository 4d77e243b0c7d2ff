package graft.ext

import graft.SparkSpec

/** Rank-2 ALS: fit quality on exactly-factorizable data, clamp safety on
  * adversarial input, report shape. Value-level parity is the q294
  * DuckDB oracle; these pin the algorithm's semantics.
  */
class FactorizationSpec extends SparkSpec {
  import spark.implicits._

  private def report(ratings: Seq[(Long, Long, Long)], rounds: Int = 2) = {
    val r = ratings.toDF("u", "i", "r")
    val segs = ratings.map(_._1).distinct
      .map(u => (u, if (u % 2 == 0) "even" else "odd")).toDF("u", "seg")
    Factorization.alsRank2Report(r, "u", "i", segs, "seg", rounds = rounds)
      .collect()
  }

  test("exact rank-1 structure fits tightly and does not degrade per round") {
    // r(u,i) = a_u · b_i is exactly representable at rank 2; ALS from the
    // deterministic init must drive the training RMSE far below the
    // rating scale and never lose ground with more rounds.
    val as = Map(1L -> 2L, 2L -> 3L, 3L -> 5L, 4L -> 7L)
    val bs = Map(10L -> 1L, 11L -> 2L, 12L -> 4L, 13L -> 3L, 14L -> 5L)
    val ratings = for {
      u <- as.keys.toSeq; i <- bs.keys.toSeq
    } yield (u, i, as(u) * bs(i))
    val rep = report(ratings, rounds = 3)
    assert(rep.length == 6) // 3 rounds x 2 segments
    val byRound = rep.groupBy(_.getAs[Int]("als_round")).view.mapValues { rs =>
      val vol = rs.map(_.getAs[Long]("n_ratings")).sum
      rs.map(r => r.getAs[Long]("rmse_micro").toDouble *
        r.getAs[Long]("n_ratings")).sum / vol
    }.toMap
    assert(byRound(3) <= byRound(1) + 1,
      s"fit degraded across rounds: $byRound")
    val meanMicro = ratings.map(_._3).sum.toDouble / ratings.size * 1e6
    assert(byRound(3) < 0.05 * meanMicro,
      s"round-3 rmse ${byRound(3)} not << mean rating $meanMicro")
  }

  test("near-singular data stays finite under the ridge + clamp contract") {
    // One item rated identically-hugely by every user: the normal matrix
    // is rank-deficient up to λ; factors must clamp, predictions and the
    // report must stay finite exact integers.
    val ratings = (1L to 5L).map(u => (u, 1L, 1000000L))
    val rep = report(ratings)
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val rmse = r.getAs[Long]("rmse_micro")
      assert(rmse >= 0, s"negative rmse $rmse")
    }
  }

  test("report volumes: every (round, segment) carries the full rating count") {
    val ratings = Seq((1L, 10L, 3L), (1L, 11L, 4L), (2L, 10L, 5L))
    val rep = report(ratings)
    // u=1 (odd): 2 ratings; u=2 (even): 1 rating — per round.
    val vols = rep.map(r => (r.getAs[Int]("als_round"),
      r.getAs[String]("segment")) -> r.getAs[Long]("n_ratings")).toMap
    assert(vols((1, "odd")) == 2 && vols((1, "even")) == 1)
    assert(vols((2, "odd")) == 2 && vols((2, "even")) == 1)
  }
}
