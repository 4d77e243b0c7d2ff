package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Generated-input equivalence for the two round-6 distributed
  * operators: whatever the data shape (duplicate-heavy keys, clustered
  * values, degenerate range counts), PrefixSum must equal the global
  * window and RangeJoin must equal the naive non-equi join. Generators
  * run with a fixed seed sample so failures reproduce. */
class OperatorFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("PrefixSum equals the global window on generated datasets") {
    val gen = for {
      n <- Gen.choose(1, 300)
      keys <- Gen.listOfN(n, Gen.choose(-50L, 50L))
      amts <- Gen.listOfN(n, Gen.choose(0L, 1000L))
    } yield keys.zip(amts).zipWithIndex.map { case ((k, a), i) =>
      (i.toLong, k, a)
    }
    val cases = Gen.listOfN(4, gen).sample.get
    cases.zipWithIndex.foreach { case (rows, ci) =>
      val df = rows.toDF("id", "v", "amt")
      for (desc <- Seq(false, true); ranges <- Seq(1, 5, 64)) {
        val ord = if (desc) Seq(col("v").desc, col("id"))
          else Seq(col("v").asc, col("id"))
        val w = Window.orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, -1)
        val ref = df.withColumn("p", coalesce(sum(col("amt")).over(w), lit(0L)))
          .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
        val got = PrefixSum.exclusive(df, "v", descending = desc,
            ties = Seq(col("id")), valueCol = "amt", outCol = "p", ranges = ranges)
          .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
        assert(got == ref, s"case=$ci desc=$desc ranges=$ranges diverged")
      }
    }
  }

  test("RangeJoin equals the naive join on generated point/interval sets") {
    val epoch = java.time.LocalDate.of(2020, 6, 1)
    val gen = for {
      np <- Gen.choose(1, 120)
      pts <- Gen.listOfN(np, Gen.zip(Gen.oneOf("a", "b"), Gen.choose(0, 200)))
      ni <- Gen.choose(1, 40)
      ivs <- Gen.listOfN(ni,
        Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0, 200), Gen.choose(-5, 40)))
    } yield (pts, ivs)
    val cases = Gen.listOfN(3, gen).sample.get
    cases.zipWithIndex.foreach { case ((pts, ivs), ci) =>
      val points = pts.map { case (k, d) =>
        (k, java.sql.Date.valueOf(epoch.plusDays(d))) }.toDF("k", "t")
      // negative lengths make reversed intervals: must be silent no-match
      val intervals = ivs.zipWithIndex.map { case ((k, d, len), i) =>
        (k, i.toLong, java.sql.Date.valueOf(epoch.plusDays(d)),
          java.sql.Date.valueOf(epoch.plusDays(d + len))) }.toDF("k", "iid", "s", "e")
      // MULTISET ground truth: generated points may repeat, and each
      // duplicate point row legitimately matches again — join
      // semantics, not double emission.
      val naive = points.collect().map(r => (r.getString(0), r.getDate(1)))
        .flatMap { case (pk, t) =>
          intervals.collect().collect {
            case r if r.getString(0) == pk && !t.before(r.getDate(2)) &&
              !t.after(r.getDate(3)) => (pk, r.getLong(1), t.toString)
          }
        }.groupBy(identity).view.mapValues(_.length).toMap
      for (w <- Seq(1, 7, 45)) {
        val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
            "t", "s", "e", bucketDays = w)
          .select(col("k"), col("iid"), col("t")).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDate(2).toString))
          .groupBy(identity).view.mapValues(_.length).toMap
        assert(got == naive, s"case=$ci w=$w diverged")
      }
    }
  }

  test("ZOrder preserves the exact row multiset on generated datasets") {
    val gen = for {
      n <- Gen.choose(1, 400)
      xs <- Gen.listOfN(n, Gen.choose(-1000, 1000))
      ys <- Gen.listOfN(n, Gen.oneOf(Gen.choose(0, 5), Gen.choose(0, 100000)))
    } yield xs.zip(ys).zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    val cases = Gen.listOfN(3, gen).sample.get
    cases.zipWithIndex.foreach { case (rows, ci) =>
      val df = rows.toDF("id", "x", "y")
      for (bits <- Seq(1, 6)) {
        val z = ZOrder.zorderBy(df, Seq("x", "y"), bits = bits,
          numPartitions = 7)
        assert(z.columns.toSeq == Seq("id", "x", "y"), s"case=$ci bits=$bits")
        val got = z.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
          .sorted.toSeq
        assert(got == rows.sorted.toSeq, s"case=$ci bits=$bits lost rows")
      }
    }
  }

  test("GIF LZW roundtrip and WAV stats agree with a brute recompute on random docs") {
    val gen = Gen.listOfN(40, Gen.choose(32, 126)).map(_.map(_.toChar).mkString)
    val texts = Gen.listOfN(8, gen).sample.get
    texts.zipWithIndex.foreach { case (text, i) =>
      val id = i.toLong * 3 + 2 // video modality ids
      val bytes = text.getBytes("UTF-8")
      val frames = graft.ext.Multimodal.decodeGifPixels(
        graft.ext.Multimodal.gifPayload(id, bytes)).get
      val w = (1 + id % 32).toInt; val h = (1 + (id * 3) % 32).toInt
      val expected = (0 until (1 + id % 10).toInt * w * h)
        .map(k => (bytes(k % bytes.length) & 0x7f).toByte)
      assert(frames.flatten.toSeq == expected, s"doc $id pixel drift")
      val aid = i.toLong * 3 + 1 // audio modality ids
      val (_, ch, data) = graft.ext.Multimodal.decodeWavSamples(
        graft.ext.Multimodal.wavPayload(aid, bytes)).get
      assert(ch == (1 + aid % 2).toInt)
      assert(data.length == bytes.length + (if (bytes.length % ch == 0) 0 else 1))
      assert(data.take(bytes.length).toSeq == bytes.toSeq)
    }
  }

  test("boruvkaForest equals Kruskal's maximum spanning forest on generated graphs") {
    // Kruskal with union-find is the sequential reference; the max
    // spanning forest WEIGHT and EDGE COUNT are unique regardless of
    // tie-breaking, so a converged Borůvka run must match both. Chain-
    // and clique-heavy shapes stress the exact-merge loop (a bounded
    // merge would grow cycles exactly here).
    def kruskalMax(edges: Seq[(Long, Long, Long)]): (Long, Long) = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      var (w, n) = (0L, 0L)
      edges.sortBy { case (u, v, s) => (-s, u, v) }.foreach {
        case (u, v, s) =>
          val (ru, rv) = (find(u), find(v))
          if (ru != rv) { parent(ru) = rv; w += s; n += 1 }
      }
      (w, n)
    }
    val gen = for {
      n <- Gen.choose(4, 24)
      m <- Gen.choose(n - 1, 3 * n)
      us <- Gen.listOfN(m, Gen.choose(0L, n - 1L))
      vs <- Gen.listOfN(m, Gen.choose(0L, n - 1L))
      ws <- Gen.listOfN(m, Gen.choose(1L, 9L))
    } yield us.lazyZip(vs).lazyZip(ws).toList.collect {
      case (u, v, w) if u != v => (math.min(u, v), math.max(u, v), w)
    }.groupBy(e => (e._1, e._2)).map(_._2.head).toSeq // dedup parallel edges
    // a pure chain with increasing weights: the worst case for merges
    val chain = (0L until 20L).map(i => (i, i + 1, i + 1))
    val cases = chain +: Gen.listOfN(5, gen).sample.get.filter(_.nonEmpty)
    cases.zipWithIndex.foreach { case (edges, ci) =>
      val (wantW, wantN) = kruskalMax(edges)
      val last = Graph.boruvkaForest(edges.toDF("u", "v", "s"), rounds = 6)
        .collect().maxBy(_.getAs[Int]("round"))
      assert(last.getAs[Long]("n_cross_edges") >= 0)
      // 6 rounds cover >= 2^6 nodes; every case here converges
      withClue(s"case $ci: ") {
        assert(last.getAs[Long]("forest_support_total") == wantW)
        assert(last.getAs[Long]("forest_edges_total") == wantN)
      }
    }
  }

  test("ktrussTrajectory fixpoint equals the brute peel on generated graphs") {
    def brutePeel(edges: Set[(Long, Long)], minSup: Int): Set[(Long, Long)] = {
      var cur = edges
      var changed = true
      while (changed) {
        val adj = cur.flatMap { case (u, v) => Seq(u -> v, v -> u) }
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val next = cur.filter { case (u, v) =>
          (adj(u) & adj(v)).size >= minSup
        }
        changed = next != cur
        cur = next
      }
      cur
    }
    val gen = for {
      n <- Gen.choose(4, 16)
      m <- Gen.choose(n, 3 * n)
      us <- Gen.listOfN(m, Gen.choose(0L, n - 1L))
      vs <- Gen.listOfN(m, Gen.choose(0L, n - 1L))
    } yield us.zip(vs).collect {
      case (u, v) if u != v => (math.min(u, v), math.max(u, v))
    }.toSet
    val cases = Gen.listOfN(6, gen).sample.get.filter(_.nonEmpty)
    cases.zipWithIndex.foreach { case (edges, ci) =>
      val want = brutePeel(edges, 2).size
      val t = Graph.ktrussTrajectory(edges.toSeq.toDF("u", "v"), k = 4,
        rounds = 8).collect().sortBy(_.getAs[Int]("round"))
      // 8 rounds suffice for these sizes: the last round must be a
      // fixpoint AND match the brute peel's surviving edge count
      withClue(s"case $ci: ") {
        assert(t.last.getAs[Int]("converged") == 1, "did not reach fixpoint")
        assert(t.last.getAs[Long]("n_edges_after") == want.toLong)
      }
    }
  }
}
