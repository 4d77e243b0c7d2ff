package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def report(edges: Seq[(Long, Long)]) =
    Graph.triangleReport(
      Graph.undirectedEdges(edges.toDF("a", "b"), "a", "b"))
      .collect().head

  test("K4 has 4 triangles and clustering 1") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val r = report(k4)
    assert(r.getAs[Long]("n_nodes") === 4)
    assert(r.getAs[Long]("n_edges") === 6)
    assert(r.getAs[Long]("n_wedges") === 12) // 4 nodes × C(3,2)
    assert(r.getAs[Long]("n_triangles") === 4)
    assert(r.getAs[Long]("clustering_ppm") === 1000000L)
  }

  test("a path graph has no triangles") {
    val r = report(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(r.getAs[Long]("n_triangles") === 0)
    assert(r.getAs[Long]("clustering_ppm") === 0)
  }

  test("a hub star with one closing edge has exactly one triangle") {
    // hub 0 connected to 1..6, plus edge (1,2): only {0,1,2} closes
    val star = (1L to 6L).map(i => (0L, i)) :+ (1L, 2L)
    val r = report(star)
    assert(r.getAs[Long]("n_triangles") === 1)
  }

  test("sampled census at p=1 reproduces the exact count and edge totals") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val r = Graph.triangleReportSampled(
      Graph.undirectedEdges(k4.toDF("a", "b"), "a", "b"), pPpm = 1000000L)
      .collect().head
    assert(r.getAs[Long]("n_edges_total") === 6)
    assert(r.getAs[Long]("n_edges_sampled") === 6)
    assert(r.getAs[Long]("n_triangles_sampled") === 4)
    assert(r.getAs[Long]("est_triangles") === 4)
  }

  test("sampled census is deterministic and within the stated error envelope") {
    // triangle-rich fixture: 3 disjoint cliques K12 ∪ K10 ∪ K8 plus a
    // triangle-free path — exact count 220+120+56 = 396
    def clique(off: Long, n: Long) =
      for (i <- 0L until n; j <- (i + 1) until n) yield (off + i, off + j)
    val edges = clique(0, 12) ++ clique(100, 10) ++ clique(200, 8) ++
      (300L to 340L).sliding(2).map(s => (s(0), s(1))).toSeq
    val e = Graph.undirectedEdges(edges.toDF("a", "b"), "a", "b")
    val exact = Graph.triangleReport(e).collect().head.getAs[Long]("n_triangles")
    assert(exact === 396L)
    val r1 = Graph.triangleReportSampled(e, pPpm = 600000L).collect().head
    val r2 = Graph.triangleReportSampled(e, pPpm = 600000L).collect().head
    // determinism: the hash gate has no RNG state — identical reruns
    assert(r1 === r2)
    // unbiasedness envelope: with T·p³ ≈ 86 surviving triangles the
    // relative sd is ~1/√86 ≈ 11%; assert a generous 3-sigma band so the
    // spec pins "estimator in the right regime", not one lucky draw
    val est = r1.getAs[Long]("est_triangles").toDouble
    assert(est > exact * 0.55 && est < exact * 1.45,
      s"estimate $est implausibly far from exact $exact")
    // the sampled subgraph really is a subgraph, not a re-count
    assert(r1.getAs[Long]("n_edges_sampled") < r1.getAs[Long]("n_edges_total"))
  }

  test("undirected canonicalization drops loops/dupes and matches brute force") {
    // deterministic pseudo-random graph; count triangles by brute force
    val n = 40
    val edges = (for (i <- 0 until n; j <- (i + 1) until n
                      if (i * 31 + j * 17) % 5 == 0)
      yield (i.toLong, j.toLong))
    val es = edges.toSet
    var brute = 0L
    for (a <- 0 until n; b <- (a + 1) until n; c <- (b + 1) until n)
      if (es((a.toLong, b.toLong)) && es((a.toLong, c.toLong)) &&
          es((b.toLong, c.toLong))) brute += 1
    // feed both orientations + dupes + loops; canonicalization cleans up
    val messy = edges ++ edges.map(_.swap) ++ Seq((3L, 3L))
    val r = report(messy)
    assert(r.getAs[Long]("n_edges") === edges.size)
    assert(r.getAs[Long]("n_triangles") === brute)
  }
}
