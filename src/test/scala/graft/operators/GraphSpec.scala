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

  /** Textbook peeling (Matula–Beck): remove min-degree nodes level by
    * level; a node's coreness is the level it dies at. */
  private def bruteCoreness(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = collection.mutable.Map.empty[Long, collection.mutable.Set[Long]]
    edges.foreach { case (u, v) =>
      if (u != v) {
        adj.getOrElseUpdate(u, collection.mutable.Set.empty) += v
        adj.getOrElseUpdate(v, collection.mutable.Set.empty) += u
      }
    }
    val deg = collection.mutable.Map(
      adj.map { case (k, s) => k -> s.size.toLong }.toSeq: _*)
    val core = collection.mutable.Map.empty[Long, Long]
    val alive = collection.mutable.Set(adj.keys.toSeq: _*)
    var k = 0L
    while (alive.nonEmpty) {
      k += 1
      var done = false
      while (!done) {
        val rm = alive.filter(v => deg(v) < k).toSeq
        if (rm.isEmpty) done = true
        else rm.foreach { v =>
          core(v) = k - 1; alive -= v
          adj(v).foreach(u => if (alive(u)) deg(u) -= 1)
        }
      }
    }
    core.toMap
  }

  test("corenessHIndex equals brute-force peeling on K4+tail+star") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val edges = k4 ++ Seq((3L, 10L), (10L, 11L), (11L, 12L)) ++
      (20L to 25L).map(i => (19L, i))
    val out = Graph.corenessHIndex(
      Graph.undirectedEdges(edges.toDF("a", "b"), "a", "b")).collect()
    val want = bruteCoreness(edges)
    assert(out.length === want.size)
    out.foreach { r =>
      assert(r.getAs[Long]("coreness") === want(r.getAs[Long]("node")),
        s"node ${r.getAs[Long]("node")}")
      assert(r.getAs[Int]("converged") === 1)
    }
    // K4 members sit in the 3-core; the chain and star are 1-core
    assert(out.find(_.getAs[Long]("node") == 0L).get
      .getAs[Long]("coreness") === 3)
    assert(out.find(_.getAs[Long]("node") == 3L).get
      .getAs[Long]("degree") === 4) // 3 clique edges + the tail
    assert(out.find(_.getAs[Long]("node") == 19L).get
      .getAs[Long]("coreness") === 1)
  }

  test("corenessHIndex converges on a 20-node path (slow-propagation shape)") {
    // h-index convergence walks inward one node per round on a path —
    // the worst case for fixed rounds; 20 nodes needs ~10, default 24
    // must certify the fixpoint.
    val path = (0L until 19L).map(i => (i, i + 1))
    val out = Graph.corenessHIndex(
      Graph.undirectedEdges(path.toDF("a", "b"), "a", "b")).collect()
    assert(out.forall(_.getAs[Long]("coreness") == 1L))
    assert(out.forall(_.getAs[Int]("converged") == 1))
  }

  test("q223 copurchase coreness replays brute-force peeling at sf0.001") {
    val out = graft.queries.GraphAnalytics.copurchaseCoreness(spark, sf001)
      .collect()
    val it = graft.model.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = it.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).toSeq.collect {
      // (.toSeq first: collect on the Map would rebuild a Map from the
      // yielded (u,v) pairs and silently dedup edges by u)
      case (e, occ) if occ.size >= 2 => e
    }
    val want = bruteCoreness(edges)
    assert(out.length === want.size)
    out.foreach { r =>
      assert(r.getAs[Long]("coreness") === want(r.getAs[Long]("part")),
        s"part ${r.getAs[Long]("part")}")
      assert(r.getAs[Int]("converged") === 1)
    }
    // dense sf0.001 graph: deep cores exist (the fixture regime q202's
    // single k can't see) — the decomposition must be non-trivial
    assert(out.map(_.getAs[Long]("coreness")).distinct.length > 3)
  }

  test("localClustering: closed, open and bridge neighborhoods on fixtures") {
    // K4 ∪ (star 0-spokes with one closing edge, offset ids): K4 nodes
    // have every neighbor pair closed (lcc = 1e6); the star hub sees 1
    // of its C(6,2)=15 pairs closed; the two closing spokes have their
    // single pair closed; other spokes are open
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val star = (11L to 16L).map(i => (10L, i)) :+ (11L, 12L)
    val out = Graph.localClustering(
      Graph.undirectedEdges((k4 ++ star).toDF("a", "b"), "a", "b"))
      .collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"),
          r.getAs[Long]("lcc_ppm"))).toMap
    (0L to 3L).foreach(n => assert(out(n) === ((3L, 3L, 1000000L)), s"K4 $n"))
    assert(out(10L) === ((6L, 1L, 66666L))) // ⌊2·1·1e6/30⌋
    assert(out(11L) === ((2L, 1L, 1000000L)))
    assert(out(12L) === ((2L, 1L, 1000000L)))
    (13L to 16L).foreach(n => assert(out(n) === ((1L, 0L, 0L)), s"spoke $n"))
  }

  test("per-node triangle counts sum to 3x the global census at sf0.001") {
    val perNode = graft.queries.GraphAnalytics.copurchaseLcc(spark, sf001)
      .collect().map(_.getAs[Long]("n_triangles")).sum
    // global census over the SAME support-2 graph
    val it = graft.model.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey").as("oid"), col("l_partkey").as("item"))
      .distinct()
    val edges = it.join(it.withColumnRenamed("item", "item2"), Seq("oid"))
      .filter(col("item") < col("item2"))
      .groupBy("item", "item2").agg(count(lit(1)).as("s"))
      .filter(col("s") >= 2)
      .select(col("item").as("u"), col("item2").as("v"))
    val global = Graph.triangleReport(edges).collect().head
      .getAs[Long]("n_triangles")
    assert(global > 0, "fixture graph must contain triangles")
    assert(perNode === 3 * global)
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

  /** Synchronous LPA replay: exactly the operator's contract — every
    * node simultaneously takes its neighbors' most frequent previous-
    * round label, ties to the smallest label. */
  private def bruteLpa(edges: Seq[(Long, Long)], rounds: Int)
      : (Map[Long, Long], Long) = {
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    var prev = lab
    for (_ <- 1 to rounds) {
      prev = lab
      lab = adj.map { case (n, nbrs) =>
        val votes = nbrs.groupBy(prev).view.mapValues(_.size).toMap
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    (lab, lab.count { case (n, l) => prev(n) != l }.toLong)
  }

  test("LPA separates two triangles joined by a bridge, modularity exact") {
    // triangles {1,2,3} and {4,5,6} with bridge 3-4: LPA should find
    // exactly the two triangles as communities, and Newman modularity
    // of that partition is (4·7·3−7²)·2 / (4·7²) = 70/196 → 357143 e6
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val rows = Graph.lpaCommunities(
      Graph.undirectedEdges(edges.toDF("a", "b"), "a", "b")).collect()
    assert(rows.length === 2)
    val bySize = rows.map(r => (r.getAs[Long]("community"),
      r.getAs[Long]("n_nodes"), r.getAs[Long]("intra_edges"),
      r.getAs[Long]("deg_sum"))).toSeq
    assert(bySize.toSet === Set((1L, 3L, 3L, 7L), (3L, 3L, 3L, 7L)))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_communities") === 2)
      assert(r.getAs[Long]("modularity_e6") === 357143L)
      assert(r.getAs[Long]("n_changed_last") === 0L) // fixpoint reached
    }
  }

  test("lpaConductance: bridge conductance exact on the two-triangle fixture") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val rows = Graph.lpaConductance(
      Graph.undirectedEdges(edges.toDF("a", "b"), "a", "b")).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nodes") === 3L)
      assert(r.getAs[Long]("volume") === 7L)     // 2+2+3 per triangle
      assert(r.getAs[Long]("cut_edges") === 1L)  // the bridge
      // phi = 1 / min(7, 14-7) = 142857 ppm
      assert(r.getAs[Long]("conductance_ppm") === 142857L)
    }
    // a community spanning the whole graph: complement volume 0 → 0
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val one = Graph.lpaConductance(
      Graph.undirectedEdges(tri, "a", "b")).collect()
    assert(one.length === 1)
    assert(one.head.getAs[Long]("cut_edges") === 0L)
    assert(one.head.getAs[Long]("conductance_ppm") === 0L)
  }

  test("q279 consumes q263's exact assignment (shared loop)") {
    val a = graft.queries.GraphAnalytics.copurchaseCommunities(spark, sf001)
      .collect().map(r => r.getAs[Long]("community") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("deg_sum"))).toMap
    val b = graft.queries.GraphAnalytics.copurchaseConductance(spark, sf001)
      .collect().map(r => r.getAs[Long]("community") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("volume"))).toMap
    // same top-20 rule on identical labels → identical keys and volumes
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(b(k) === v, s"community $k") }
  }

  test("LPA labels match the synchronous brute replay on a random graph") {
    val n = 30
    val edges = (for (i <- 0 until n; j <- (i + 1) until n
                      if (i * 37 + j * 23) % 7 == 0)
      yield (i.toLong, j.toLong))
    val (brute, bruteChanged) = bruteLpa(edges, rounds = 4)
    val rows = Graph.lpaCommunities(
        Graph.undirectedEdges(edges.toDF("a", "b"), "a", "b"),
        rounds = 4, topK = 1000).collect()
    val bruteComms = brute.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = rows.map(r =>
      r.getAs[Long]("community") -> r.getAs[Long]("n_nodes")).toMap
    assert(got === bruteComms)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_changed_last") === bruteChanged))
  }

  /** Integer HITS replay: exactly the operator's ∞-norm contract. */
  private def bruteHits(edges: Seq[(Long, Long)], rounds: Int)
      : (Map[Long, BigInt], Map[Long, BigInt]) = {
    val byC = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val byP = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var a: Map[Long, BigInt] = byP.keys.map(_ -> BigInt(1000000)).toMap
    var h: Map[Long, BigInt] = Map.empty
    for (_ <- 1 to rounds) {
      val hr = byC.map { case (c, ps) => c -> ps.map(a).sum }
      val hmax = hr.values.max
      h = hr.map { case (c, x) => c -> x * 1000000 / hmax }
      val ar = byP.map { case (p, cs) => p -> cs.map(h).sum }
      val amax = ar.values.max
      a = ar.map { case (p, x) => p -> x * 1000000 / amax }
    }
    (h, a)
  }

  test("HITS matches the integer replay on a nested bipartite fixture") {
    // c1 buys {p1,p2,p3}, c2 buys {p1,p2}, c3 buys {p1}: authority must
    // order p1 > p2 > p3 and hubs c1 > c2 > c3, scores exactly replayed
    val edges = Seq((1L, 101L), (1L, 102L), (1L, 103L),
      (2L, 101L), (2L, 102L), (3L, 101L))
    val (eh, ea) = bruteHits(edges, rounds = 3)
    val rows = Graph.hits(edges.toDF("c", "p")).collect()
    val hubs = rows.filter(_.getAs[String]("side") == "hub")
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("score_e6")).toMap
    val auths = rows.filter(_.getAs[String]("side") == "auth")
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("score_e6")).toMap
    assert(hubs === eh.map { case (k, v) => k -> v.toLong })
    assert(auths === ea.map { case (k, v) => k -> v.toLong })
    assert(auths(101L) > auths(102L) && auths(102L) > auths(103L))
    assert(hubs(1L) > hubs(2L) && hubs(2L) > hubs(3L))
    // degrees carried through
    val degs = rows.map(r => (r.getAs[String]("side"),
      r.getAs[Long]("node")) -> r.getAs[Long]("degree")).toMap
    assert(degs(("hub", 1L)) === 3L && degs(("auth", 101L)) === 3L)
  }

  test("HITS topK trims each side independently") {
    val edges = Seq((1L, 101L), (1L, 102L), (2L, 101L), (3L, 102L))
    val rows = Graph.hits(edges.toDF("c", "p"), topK = 1).collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[String]("side")).toSet === Set("hub", "auth"))
  }

  test("single-community graph reports modularity 0") {
    // a triangle alone: one community holding everything, Q = 0 exactly
    // (4·3·3 − 6²) / (4·9) = 0
    val rows = Graph.lpaCommunities(
      Graph.undirectedEdges(
        Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b"), "a", "b"))
      .collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("modularity_e6") === 0L)
    assert(rows.head.getAs[Long]("intra_edges") === 3L)
  }

  /** Scala replica of the operator's integer Brandes contract: batched
    * BFS with exact σ, backward δ with the per-term ⌊σv·(10⁶+δw)/σw⌋
    * quantization, sources = the nSources lowest ids. */
  private def bruteBetweenness(edges: Seq[(Long, Long)], nSources: Int,
                               maxDepth: Int): Map[Long, (Long, BigInt)] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val acc = collection.mutable.Map.empty[Long, (Long, BigInt)]
    nodes.take(nSources).foreach { s =>
      var layers = Vector(Map(s -> BigInt(1))) // dist -> node -> sigma
      var visited = Set(s)
      for (_ <- 1 to maxDepth) {
        val next = collection.mutable.Map.empty[Long, BigInt]
        layers.last.foreach { case (u, sg) =>
          adj(u).filterNot(visited).foreach { v =>
            next(v) = next.getOrElse(v, BigInt(0)) + sg
          }
        }
        layers = layers :+ next.toMap
        visited ++= next.keySet
      }
      var deltas = Map.empty[Long, BigInt] // next layer's deltas
      var layerDeltas = Vector.empty[Map[Long, BigInt]]
      for (t <- (layers.size - 1) to 0 by -1) {
        val cur = layers(t).map { case (v, sv) =>
          v -> adj(v).toSeq
            .filter(w => layers.lift(t + 1).exists(_.contains(w)))
            .map { w =>
              (sv * (1000000 + deltas(w))) / layers(t + 1)(w)
            }.sum
        }
        layerDeltas = cur +: layerDeltas
        deltas = cur
      }
      layerDeltas.flatten.foreach { case (v, d) =>
        if (v != s) {
          val (n0, d0) = acc.getOrElse(v, (0L, BigInt(0)))
          acc(v) = (n0 + 1, d0 + d)
        }
      }
    }
    acc.toMap
  }

  test("sampledBetweenness: star and path fixtures match hand math") {
    // star: center 0, leaves 1..5 — sources {0,1,2,3}; each leaf source
    // routes 4 paths through the center: delta(0) = 3 x 4e6
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L))
      .toDF("u", "v")
    val s = Graph.sampledBetweenness(star, nSources = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(s(0L) === ((3L, 12000000L, 9000000L))) // est = 12e6·6/(2·4)
    s.filterKeys(_ != 0L).values.foreach { case (_, d, _) =>
      assert(d === 0L)
    }
    // path 1-2-3-4-5, sources {1,2,3,4}: hand-accumulated dependencies
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val p = Graph.sampledBetweenness(path, nSources = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(p(2L) === 5000000L && p(3L) === 6000000L && p(4L) === 3000000L)
    assert(p(1L) === 0L && p(5L) === 0L)
  }

  test("q274 betweenness replays integer Brandes at sf0.001") {
    val spark2 = spark
    import spark2.implicits._
    val out = graft.queries.GraphAnalytics
      .copurchaseBetweenness(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // rebuild the operator's own edge list and replay
    val it = graft.model.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey").as("oid"), col("l_partkey").as("item"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = it.groupBy(_._1).values.flatMap { g =>
      val items = g.map(_._2).distinct.toSeq
      for (a <- items; b <- items if a < b) yield (a, b)
    }.groupBy(identity).toSeq
      .collect { case (p, xs) if xs.size >= 2 => p }
    val exp = bruteBetweenness(edges, nSources = 4, maxDepth = 6)
    val top = exp.toSeq
      .sortBy { case (n, (_, d)) => (-d, n) }.take(20)
    assert(out.size === math.min(20, top.size))
    top.take(out.size).foreach { case (n, (nr, d)) =>
      assert(out(n) === ((nr, d.toLong)), s"node $n")
    }
    // non-vacuous: some broker accumulates dependency
    assert(top.headOption.exists(_._2._2 > 0), "all dependencies zero")
  }

  test("q285 double-sweep diameter: exact on a path, bound on a star, " +
      "sane at sf0.001") {
    // path 1-2-3-4-5: anchor = 1, ecc1 = 4 (far node 5); sweep 2 from 5
    // reaches back to 1 at dist 4 — diameter_lb = 4 = the true diameter
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val p = graft.operators.Graph.doubleSweepDiameter(path, maxHops = 6)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4), r.getInt(5),
          r.getInt(6))).toMap
    assert(p(1) === ((1L, 5L, 4, 5L, 1, 4)))
    assert(p(2) === ((5L, 1L, 4, 5L, 1, 4)))
    // star centered at 10: anchor = 1 (a leaf), ecc1 = 2 (far = smallest
    // other leaf 2); sweep 2 from 2 — diameter_lb = 2 = true diameter
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)).toDF("u", "v")
    val s = graft.operators.Graph.doubleSweepDiameter(star, maxHops = 6)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(6))).toMap
    assert(s(1) === ((1L, 2L, 2, 2)))
    assert(s(2) === ((2L, 1L, 2, 2)))
    // the registered bipartite graph: two rows, lb >= each sweep's ecc,
    // second sweep never reaches fewer nodes than its component allows
    val out = graft.queries.GraphAnalytics.copurchaseDiameter(spark, sf001)
      .collect().map(r => r.getInt(0) ->
        (r.getInt(3), r.getLong(4), r.getInt(6))).toMap
    assert(out.keySet === Set(1, 2))
    assert(out(1)._3 === math.max(out(1)._1, out(2)._1))
    assert(out(2)._1 >= out(1)._1,
      "second sweep eccentricity below the first — double sweep broken")
    assert(out(1)._2 > 1L, "sweep 1 reached nothing")
  }

  test("q291 iFUB certificate: certifies path/star exactly, ub >= lb " +
      "always, honest capping at sf0.001") {
    // Output columns: step root level n_fringe n_probed probe_ecc_max
    //                 lb ub fringe_capped exact certified
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getInt(5),
          r.getInt(6), r.getInt(7), r.getInt(8), r.getInt(9),
          r.getInt(10))).toMap
    def invariants(m: Map[Int, (Long, Int, Long, Long, Int, Int, Int, Int,
        Int, Int)]): Unit = {
      assert(m.keySet === Set(0, 1, 2))
      m.values.foreach { v =>
        assert(v._7 >= v._6, s"ub ${v._7} < lb ${v._6}")
        assert(v._4 <= v._3, "probed more nodes than the fringe holds")
      }
      // lb monotone non-decreasing, ub monotone non-increasing by step
      assert(m(1)._6 >= m(0)._6 && m(2)._6 >= m(1)._6, "lb not monotone")
      assert(m(1)._7 <= m(0)._7 && m(2)._7 <= m(1)._7, "ub not monotone")
      // certified only with exact sweeps and a closed gap
      m.values.foreach(v =>
        assert(v._10 == (if (v._7 == v._6 && v._9 == 1) 1 else 0)))
    }
    // path 1-2-3-4-5: far1 = 5, far2 = 1, midpoint root = 3, ecc_root = 2
    // → ub0 = 4 = lb0: certified at step 0, and the fringe probes (the
    // path ends {1,5}) keep it certified with fringes far under the cap.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val p = rows(graft.operators.Graph.ifubDiameter(path, maxHops = 6))
    invariants(p)
    assert(p(0)._1 == 3L, "midpoint of the 1..5 path must be 3")
    assert(p(0)._6 == 4 && p(0)._7 == 4 && p(0)._10 == 1)
    assert(p(2)._6 == 4 && p(2)._7 == 4 && p(2)._10 == 1)
    assert(p.values.forall(_._8 == 0), "no fringe overflows cap=32 here")
    // star centered at 10: root = the hub, ecc_root = 1, ub0 = 2 = lb0.
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)).toDF("u", "v")
    val s = rows(graft.operators.Graph.ifubDiameter(star, maxHops = 6))
    invariants(s)
    assert(s(0)._1 == 10L && s(0)._6 == 2 && s(0)._7 == 2 && s(0)._10 == 1)
    // a 6-cycle: true diameter 3; root is any node, ecc_root = 3,
    // ub0 = 6 > lb0 = 3 — certification must come from the REFINEMENT:
    // full fringe probes pull ub down to max(lb, 2(ecc_root-2)) ... = 3?
    // iFUB on C6: fringe at level 3 (the antipode), probe ecc 3 →
    // ub1 = min(6, max(3, 4)) = 4; level-2 fringe (two nodes) probe 3 →
    // ub2 = min(4, max(3, 2)) = 3 = lb: certified exactly at step 2.
    val c6 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 1L))
      .toDF("u", "v")
    val c = rows(graft.operators.Graph.ifubDiameter(c6, maxHops = 6))
    invariants(c)
    assert(c(0)._6 == 3 && c(0)._7 == 6 && c(0)._10 == 0)
    assert(c(2)._6 == 3 && c(2)._7 == 3 && c(2)._10 == 1,
      "C6 must certify via the two fringe refinements, not the sweep")
    // a cap smaller than the fringe: ub must NOT tighten, flag must raise
    val starBig = (1L to 40L).map(i => (0L, i)).toDF("u", "v")
    val sb = rows(graft.operators.Graph.ifubDiameter(starBig, maxHops = 6,
      cap = 8))
    invariants(sb)
    assert(sb(1)._3 == 40L && sb(1)._4 == 8L && sb(1)._8 == 1,
      "40-leaf fringe over cap=8 must report fringe_capped=1")
    assert(sb(1)._7 == sb(0)._7, "capped probe must not tighten ub")
    // the registered co-purchase graph at sf0.001: invariants + the q285
    // double-sweep lb is never above this certificate's lb
    val out = rows(
      graft.queries.GraphAnalytics.copurchaseDiameterCertified(spark, sf001))
    invariants(out)
    val q285lb = graft.queries.GraphAnalytics.copurchaseDiameter(spark, sf001)
      .agg(org.apache.spark.sql.functions.max("diameter_lb")).head.getInt(0)
    assert(out(2)._6 >= q285lb, "certificate lb regressed below q285's lb")
  }

  test("boruvkaForest: hand fixture keeps the maximum spanning tree") {
    // Square with a diagonal: the max spanning tree keeps s=9,5,3 and
    // drops s=1 and s=2 (cycle-closing weakest edges).
    val edges = Seq(
      (1L, 2L, 5L), (2L, 3L, 3L), (3L, 4L, 9L), (1L, 3L, 1L),
      (1L, 4L, 2L)).toDF("u", "v", "s")
    val t = graft.operators.Graph.boruvkaForest(edges, rounds = 3)
      .collect().sortBy(_.getAs[Int]("round"))
    val last = t.last
    assert(last.getAs[Long]("n_components_after") == 1L)
    assert(last.getAs[Long]("forest_edges_total") == 3L)   // V - 1
    assert(last.getAs[Long]("forest_support_total") == 17L) // 9 + 5 + 3
    // trajectory invariants: components never increase; forest only grows
    t.foreach { r =>
      assert(r.getAs[Long]("n_components_after") <=
        r.getAs[Long]("n_components_before"))
    }
    assert(t.map(_.getAs[Long]("forest_edges_total")).toSeq ==
      t.map(_.getAs[Long]("forest_edges_total")).sorted.toSeq)
  }

  test("ktrussTrajectory: clique survives, pendant and bridge edges peel") {
    // K4 (every edge in 2 triangles) + a pendant spoke (0 triangles) + a
    // triangle hanging off one clique node by a bridge: the 4-truss is
    // exactly the K4 — round 1 drops the pendant, the bridge, and the
    // hanging triangle's edges (support 1 < 2), round 2 confirms.
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val pendant = Seq((4L, 9L))
    val hang = Seq((4L, 5L), (5L, 6L), (5L, 7L), (6L, 7L))
    val edges = (k4 ++ pendant ++ hang).toDF("u", "v")
    val t = graft.operators.Graph.ktrussTrajectory(edges, k = 4, rounds = 3)
      .collect().sortBy(_.getAs[Int]("round"))
    assert(t.head.getAs[Long]("n_edges_before") == 11L)
    // K4 holds 4 triangles; the hanging triangle is 1 more
    assert(t.head.getAs[Long]("n_triangles") == 5L)
    val last = t.last
    assert(last.getAs[Long]("n_edges_after") == 6L, "4-truss must be the K4")
    assert(last.getAs[Int]("converged") == 1)
    // support never resurrects: edge counts are non-increasing
    val counts = t.map(_.getAs[Long]("n_edges_after")).toSeq
    assert(counts == counts.sorted.reverse)
  }

  test("boruvkaForest: disjoint components converge to a spanning FOREST") {
    val edges = Seq(
      (1L, 2L, 4L), (2L, 3L, 6L),         // component A: 3 nodes
      (10L, 11L, 7L), (11L, 12L, 2L), (10L, 12L, 9L)) // component B: 3 nodes
      .toDF("u", "v", "s")
    val last = graft.operators.Graph.boruvkaForest(edges, rounds = 3)
      .collect().maxBy(_.getAs[Int]("round"))
    assert(last.getAs[Long]("n_components_after") == 2L)
    assert(last.getAs[Long]("forest_edges_total") == 4L) // (3-1) + (3-1)
    // B keeps 9 + 7 (drops 2); A keeps everything (tree already)
    assert(last.getAs[Long]("forest_support_total") == 4L + 6L + 7L + 9L)
    assert(last.getAs[Long]("n_cross_edges") >= 0L)
  }
}
