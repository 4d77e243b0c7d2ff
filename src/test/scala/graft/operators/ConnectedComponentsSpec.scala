package graft.operators

import graft.SparkSpec

/** Min-label propagation: chained pairs collapse into one component,
  * disjoint pairs stay separate. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("labelPropagation groups transitively connected nodes") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val out = ConnectedComponents.labelPropagation(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("alternatingStar groups a chain and a disjoint pair like labelPropagation") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val out = ConnectedComponents.alternatingStar(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("alternatingStar == labelPropagation on random graphs (differential)") {
    val rnd = new scala.util.Random(42)
    (0 until 8).foreach { trial =>
      val n = 12 + rnd.nextInt(20)
      val nEdges = 5 + rnd.nextInt(25)
      val edges = Seq.fill(nEdges)(
          (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val df = edges.toDF("a", "b")
        val lp = ConnectedComponents.labelPropagation(df, "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val as = ConnectedComponents.alternatingStar(df, "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(as == lp, s"trial $trial diverged on edges $edges")
      }
    }
  }

  test("alternatingStar converges fast on a deep chain (log² rounds, not diameter)") {
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val out = ConnectedComponents.alternatingStar(chain, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 40 && out.values.forall(_ == 1L))
  }

  test("dedupClusters marks the min doc as representative") {
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      (20L, "the quick brown fox jumps over the lazy dog again and again today"),
      (30L, "entirely unrelated text about catalyst plans and shuffle exchanges here")
    ).toDF("doc_id", "text")
    val out = graft.ext.TextDedup.dedupClusters(docs, "doc_id", "text",
        k = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((10L, 10L, 1), (20L, 10L, 0)))
  }
}
