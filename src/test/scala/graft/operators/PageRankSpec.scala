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

  test("personalized ranks replay the exact integer recursion on a chain") {
    import spark.implicits._
    // path 0-1-2-3-4, seed {0}: mass decays with hop distance from the
    // seed; replay the recursion in exact Longs
    val path = (0L until 4L).map(i => (i, i + 1))
    val edges = undirected(path: _*)
    val out = PageRank.personalizedRanks(edges,
        Seq(0L).toDF("node"), iters = 3)
      .collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Int]("is_seed"), r.getAs[Long]("rank_units"))).toMap
    // Scala replay: deg, r0 = seed*Scale, 3 rounds of the same floors
    val adj = Map(0L -> Seq(1L), 1L -> Seq(0L, 2L), 2L -> Seq(1L, 3L),
      3L -> Seq(2L, 4L), 4L -> Seq(3L))
    val deg = adj.map { case (k, v) => k -> v.size.toLong }
    var r = adj.keys.map(n => n -> (if (n == 0L) PageRank.Scale else 0L)).toMap
    for (_ <- 1 to 3) {
      val in = adj.keys.map(v =>
        v -> adj.filter(_._2.contains(v)).keys
          .map(u => r(u) * 85L / (100L * deg(u))).sum).toMap
      r = adj.keys.map(n =>
        n -> ((if (n == 0L) 15L * PageRank.Scale / 100L else 0L) + in(n))).toMap
    }
    adj.keys.foreach { n =>
      assert(out(n)._2 === r(n), s"node $n")
      assert(out(n)._1 === (if (n == 0L) 1 else 0))
    }
    // finite-round reachability is exact: round t pushes mass t hops,
    // so after 3 rounds nodes within 3 hops of the seed are strictly
    // positive and the 4-hop tail is exactly 0 (no monotone-decay claim
    // — chain parity makes interior values oscillate between rounds)
    assert(Seq(0L, 1L, 2L, 3L).forall(n => out(n)._2 > 0))
    assert(out(4L)._2 === 0L)
    assert(out(1L)._2 > out(3L)._2)
  }

  test("personalized ranks: nodes in a component without seeds get zero") {
    import spark.implicits._
    val edges = undirected((0L, 1L), (5L, 6L))
    val out = PageRank.personalizedRanks(edges, Seq(0L).toDF("node"),
        iters = 2).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_units")).toMap
    assert(out(5L) === 0L && out(6L) === 0L)
    assert(out(0L) > 0 && out(1L) > 0)
  }

  test("personalized ranks at 20 iters complete without plan blowup") {
    // The evolving rank relation is checkpointed every 3 rounds — without
    // that cut, 20 rounds of join+agg re-chained onto r's plan make
    // analysis time blow up superlinearly. Bound: a 4-cycle with seed {0}
    // finishes 20 rounds in well under the suite's per-test patience, and
    // the 4-cycle's symmetric fixpoint values stay exact.
    val edges = undirected((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val out = PageRank.personalizedRanks(edges, Seq(0L).toDF("node"),
        iters = 20).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_units")).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    assert(out(0L) > out(1L) && out(1L) == out(3L) && out(1L) > 0,
      s"seed must dominate, symmetric neighbors tie: $out")
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
