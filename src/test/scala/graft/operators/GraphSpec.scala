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
