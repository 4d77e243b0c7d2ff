package graft.operators

import graft.SparkSpec

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("islands merge overlapping and touching intervals, cut on gaps") {
    val df = Seq(
      // key 1: [0,5) [3,8) touch-extend, [8,10) touches → one island;
      //        [12,14) gap → second island
      (1L, 0L, 5L), (1L, 3L, 8L), (1L, 8L, 10L), (1L, 12L, 14L),
      // key 2: identical intervals collapse into one island
      (2L, 0L, 3L), (2L, 0L, 3L),
      // key 3: nested interval does not extend
      (3L, 0L, 10L), (3L, 2L, 4L)
    ).toDF("k", "s", "e")
    val isl = Intervals.islands(df, "k", "s", "e")
      .orderBy("k", "island_id").collect()
    val byKey = isl.groupBy(_.getAs[Long]("k")).view.mapValues(_.toSeq).toMap
    assert(byKey(1L).map(r => (r.getAs[Long]("island_start"),
      r.getAs[Long]("island_end"))) === Seq((0L, 10L), (12L, 14L)))
    assert(byKey(2L).size === 1 && byKey(2L).head.getAs[Long]("n_intervals") === 2)
    assert(byKey(3L).map(r => (r.getAs[Long]("island_start"),
      r.getAs[Long]("island_end"))) === Seq((0L, 10L)))
  }

  test("coverage sums island lengths, never double-counts overlap") {
    val df = Seq((1L, 0L, 5L), (1L, 3L, 8L), (1L, 20L, 22L)).toDF("k", "s", "e")
    val r = Intervals.coverage(df, "k", "s", "e").collect().head
    assert(r.getAs[Long]("n_intervals") === 3)
    assert(r.getAs[Long]("n_islands") === 2)
    assert(r.getAs[Long]("covered") === 10) // [0,8) + [20,22)
    assert(r.getAs[Long]("span") === 22)
  }

  test("randomized: islands match a brute-force sweep on every key") {
    val rows = for (k <- 0L until 9L; i <- 0 until 80) yield {
      val s = (k * 131 + i * 37) % 400
      (k, s, s + 1 + (i * 13) % 25)
    }
    val got = Intervals.islands(rows.toDF("k", "s", "e").repartition(7),
        "k", "s", "e")
      .collect()
      .groupBy(_.getAs[Long]("k"))
      .view.mapValues(_.map(r => (r.getAs[Long]("island_start"),
        r.getAs[Long]("island_end"))).sorted.toSeq).toMap
    rows.groupBy(_._1).foreach { case (k, iv) =>
      val sorted = iv.map(t => (t._2, t._3)).sorted
      val brute = sorted.tail.foldLeft(List(sorted.head)) {
        case (acc @ ((cs, ce) :: rest), (s, e)) =>
          if (s <= ce) (cs, math.max(ce, e)) :: rest else (s, e) :: acc
        case (acc, _) => acc
      }.reverse
      assert(got(k) === brute, s"key $k islands diverged")
    }
  }

  test("keys are independent: a key's islands never leak into another") {
    val df = Seq((1L, 0L, 5L), (2L, 4L, 6L)).toDF("k", "s", "e")
    val r = Intervals.coverage(df, "k", "s", "e")
      .orderBy("k").collect()
    assert(r.map(_.getAs[Long]("n_islands")).toSeq === Seq(1L, 1L))
    assert(r.map(_.getAs[Long]("covered")).toSeq === Seq(5L, 2L))
  }
}
