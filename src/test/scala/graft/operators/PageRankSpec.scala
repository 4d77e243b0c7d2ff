package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def undirected(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("u", "v")

  test("a symmetric cycle keeps the uniform distribution exactly") {
    // 4-cycle: deg 2 everywhere; 0.15·S + 2·⌊0.85·S/2⌋ = S every round.
    val r = PageRank.ranks(undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)),
        iters = 3)
      .collect().map(x => x.getAs[Long]("node") -> x.getAs[Long]("rank_units"))
      .toMap
    assert(r.values.toSet == Set(PageRank.Scale))
    assert(r.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("a star concentrates rank on the hub") {
    val edges = undirected((1L to 6L).map(i => (0L, i + 0L)): _*)
    val r = PageRank.ranks(edges, iters = 2)
      .collect().map(x => x.getAs[Long]("node") ->
        (x.getAs[Long]("degree"), x.getAs[Long]("rank_units"))).toMap
    assert(r(0L)._1 == 6L)
    val (hub, leaves) = (r(0L)._2, (1L to 6L).map(i => r(i)._2))
    assert(leaves.toSet.size == 1, "leaves must tie exactly")
    // after 2 damped rounds: hub = 0.15S + 6·⌊0.85·r1(leaf)⌋ ≈ 1.64S,
    // leaf = 0.15S + ⌊0.85·r1(hub)/6⌋ ≈ 0.89S — strictly ordered
    assert(hub > leaves.head * 3 / 2, s"hub $hub vs leaf ${leaves.head}")
  }

  test("directed chain: source nodes persist with teleport mass every round") {
    // 1→2→3→4: node 1 has out-edges but NO in-edges. It must appear in
    // the output of every iteration depth with exactly the teleport
    // constant (nothing flows into it), not vanish after round 1.
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    for (iters <- 1 to 3) {
      val r = PageRank.ranks(chain, iters)
        .collect().map(x => x.getAs[Long]("node") -> x.getAs[Long]("rank_units"))
        .toMap
      // contract: every node with >=1 outgoing edge appears (4 is a sink)
      assert(r.keySet == Set(1L, 2L, 3L), s"iters=$iters: ${r.keySet}")
      assert(r(1L) == 15L * PageRank.Scale / 100L,
        s"iters=$iters: source must hold exactly the teleport mass, got ${r(1L)}")
      // 2 receives from 1, so it must strictly exceed the bare teleport
      assert(r(2L) > r(1L), s"iters=$iters: ${r(2L)} !> ${r(1L)}")
    }
  }

  test("directed star with a source: the source's mass reaches the spokes") {
    // 0→{1,2,3}, 1→4, 2→4, 3→4: 0 is a pure source, 4 a pure sink.
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 4L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val r = PageRank.ranks(star, iters = 2)
      .collect().map(x => x.getAs[Long]("node") -> x.getAs[Long]("rank_units"))
      .toMap
    assert(r.keySet == Set(0L, 1L, 2L, 3L))
    val tele = 15L * PageRank.Scale / 100L
    assert(r(0L) == tele)
    // round 2: spokes get teleport + ⌊0.85·tele/3⌋ from the source's
    // round-1 teleport mass — the mass a groupBy-only round would lose
    assert(Set(r(1L), r(2L), r(3L)) == Set(tele + 85L * tele / 100L / 3L))
  }

  test("floors only ever lose mass: total stays within the initial budget") {
    val rnd = new scala.util.Random(11)
    val edges = undirected(Seq.fill(60)(
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(p => p._1 != p._2).distinct: _*)
    val n = edges.select("u").distinct().count()
    val total = PageRank.ranks(edges, iters = 2)
      .agg(org.apache.spark.sql.functions.sum("rank_units")).head.getLong(0)
    assert(total <= n * PageRank.Scale)
    assert(total > n * PageRank.Scale * 9 / 10, "mass loss should be tiny")
  }
}
