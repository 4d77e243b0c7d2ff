package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def dists(edges: Seq[(Long, Long)], seeds: Seq[Long],
                    maxHops: Int): Map[(Long, Long), Int] =
    Bfs.hopDistances(
        Graph.undirectedEdges(edges.toDF("a", "b"), "a", "b"),
        seeds.toDF("seed"), maxHops)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap

  test("chain graph: exact hop counts, capped at maxHops") {
    // 1-2-3-4-5-6; from seed 1 with maxHops=3, nodes 5 and 6 are beyond
    val d = dists(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)),
      Seq(1L), maxHops = 3)
    assert(d === Map((1L, 1L) -> 0, (1L, 2L) -> 1, (1L, 3L) -> 2, (1L, 4L) -> 3))
  }

  test("shortest path wins when a longer walk also reaches the node") {
    // triangle 1-2-3 plus tail 3-4: node 3 is 1 hop via the direct edge
    val d = dists(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)), Seq(1L), 4)
    assert(d((1L, 3L)) === 1)
    assert(d((1L, 4L)) === 2)
  }

  test("multi-source: each seed gets its own distance map") {
    val d = dists(Seq((1L, 2L), (2L, 3L)), Seq(1L, 3L), 2)
    assert(d((1L, 3L)) === 2)
    assert(d((3L, 1L)) === 2)
    assert(d((3L, 2L)) === 1)
  }

  test("an isolated seed still reports itself at distance 0") {
    val d = dists(Seq((1L, 2L)), Seq(9L), 3)
    assert(d === Map((9L, 9L) -> 0))
  }

  test("maxHops=0 returns only the seeds") {
    val d = dists(Seq((1L, 2L), (2L, 3L)), Seq(1L), 0)
    assert(d === Map((1L, 1L) -> 0))
  }

  test("disconnected components never cross") {
    val d = dists(Seq((1L, 2L), (10L, 11L)), Seq(1L), 5)
    assert(!d.contains((1L, 10L)) && !d.contains((1L, 11L)))
  }
}
