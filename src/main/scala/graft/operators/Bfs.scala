package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first hop distances over an undirected edge
  * list — the reachability/shortest-path primitive behind "how far is
  * every account from a flagged seed", blast-radius analyses, and graph
  * feature engineering (hop-to-hub as a model feature).
  *
  * Pregel-style frontier expansion: level h joins the CURRENT frontier
  * (the nodes first reached at distance h) against the adjacency list
  * and anti-joins everything already visited, so each (seed, node) pair
  * is emitted exactly once, at its true shortest hop count. Distances
  * are exact BFS levels — no weights, no approximation.
  *
  * Scale shape: the adjacency list is staged once (both directions of
  * each canonical edge) and every level is one equi join keyed on the
  * frontier node plus one anti join keyed on (seed, node) — the same
  * keyed-iteration posture as [[ConnectedComponents]]; nothing
  * broadcasts by assumption, nothing collects. Frontier and visited
  * sets are (seed, node) pairs — 16-byte rows, not payloads. The level
  * loop is driver-side but bounded by `maxHops` (a query parameter, not
  * data-dependent), with per-level `localCheckpoint` truncating the
  * lineage exactly like the components loop; the empty-frontier early
  * exit reads `isEmpty` on the already-materialized checkpoint, so it
  * schedules no extra scan of anything corpus-sized.
  */
object Bfs {

  /** Hop distance from every seed to every node within `maxHops`:
    * (`seed`, `node`, `dist`) rows, dist 0 = the seed itself. `edges`
    * must be a distinct undirected edge list (`u` < `v` columns — the
    * [[Graph.undirectedEdges]] contract); `seeds` one `seed` column. */
  def hopDistances(edges: DataFrame, seeds: DataFrame,
                   maxHops: Int): DataFrame =
    hopDistancesAdj(symmetricAdjStaged(edges), seeds, maxHops)

  /** The staged symmetric adjacency for [[hopDistancesAdj]]: both
    * directions of each canonical edge, checkpointed once. Callers
    * running SEVERAL BFS passes over one graph (double sweep, iFUB's
    * six-sweep certificate) build this once instead of paying a
    * 2|E|-row materialization per sweep. */
  def symmetricAdj(edges: DataFrame): DataFrame =
    edges.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint()

  /** [[symmetricAdj]] memoized on the edge plan
    * ([[graft.ext.StageCache]]): THREE registered queries walk the same
    * supplier↔customer graph (q188 multi-source hops, q285 double
    * sweep, q291 iFUB), and before r17 q188 materialized its own
    * 2|E|-row copy of the adjacency the sweep family had already
    * staged. The key carries no hop cap — the adjacency does not
    * depend on it. */
  def symmetricAdjStaged(edges: DataFrame): DataFrame =
    graft.ext.StageCache.getOrStage(
      graft.ext.StageCache.keyFor(edges, "symadj-bfs"))(symmetricAdj(edges))

  /** [[hopDistances]] over a prebuilt [[symmetricAdj]] relation. Each
    * level's NEW reach is checkpointed once and never re-materialized:
    * `visited` stays a union over the per-level checkpointed frames
    * (≤ maxHops materialized inputs — a shallow plan, no re-copy of
    * already-found rows per level, which halves the per-level job
    * count vs re-checkpointing the whole visited set). */
  def hopDistancesAdj(adj: DataFrame, seeds: DataFrame,
                      maxHops: Int): DataFrame = {
    require(maxHops >= 0 && maxHops <= 16, s"maxHops out of [0,16]: $maxHops")
    val level0 = seeds.select(col("seed"), col("seed").as("node"),
      lit(0).as("dist")).localCheckpoint()
    val levels = scala.collection.mutable.ArrayBuffer(level0)
    var frontier = level0
    var h = 0
    while (h < maxHops && !frontier.isEmpty) {
      h += 1
      val visited = levels.reduce(_ unionAll _)
      val next = frontier.join(adj, col("node") === col("src"))
        .select(col("seed"), col("dst").as("node"))
        .distinct()
        .join(visited.select("seed", "node"), Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"), lit(h).as("dist"))
        .localCheckpoint()
      levels += next
      frontier = next
    }
    levels.reduce(_ unionAll _)
      .select(col("seed"), col("node"), col("dist").cast("int").as("dist"))
  }

  /** BIT-PARALLEL batched eccentricity (Akiba–Iwata–Yoshida 2013's
    * BFS-with-bitmasks, the standard trick for ≤64-source sweeps): all
    * seeds ride ONE frontier whose payload is a 64-bit seed-set mask
    * per node, so each level joins the adjacency ONCE — |E| rows with
    * an 8-byte payload — instead of the per-seed edge expansion
    * [[hopDistancesAdj]] pays (|seeds|·|E| rows per level, which is
    * what made iFUB's 64-probe batch the dominant cost of q291).
    *
    * `seeds` is (`seed`, `off`) — `off` tags the caller's probe GROUPS
    * (iFUB's two fringe levels); the return is one (`off`, `pecc`) row
    * per group present, where pecc = max over the group's seeds of the
    * seed's (hop-capped) eccentricity. Only per-LEVEL gained-bit unions
    * leave the loop (one 1-row aggregate per level), so the readout
    * relation is ≤ maxHops+1 rows — per-seed distance tables are never
    * materialized. A group whose every seed-bit stops gaining nodes at
    * level e contributes exactly e; truncation at maxHops understates
    * (the iFUB caller's documented lb-only degradation). */
  def groupEccentricity(adj: DataFrame, seeds: DataFrame,
                        maxHops: Int): DataFrame = {
    require(maxHops >= 0 && maxHops <= 16, s"maxHops out of [0,16]: $maxHops")
    // Bit assignment: seeds ordered (off, seed) — ≤ 64 by contract (the
    // window is over the caller's limit-capped probe batches, bounded).
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("off"), col("seed"))
    val tagged = seeds
      .withColumn("bit_idx", row_number().over(w) - 1)
      .withColumn("bit", expr("shiftleft(CAST(1 AS BIGINT), bit_idx)"))
      .drop("bit_idx")
      .localCheckpoint()
    require(tagged.count() <= 64, "groupEccentricity holds at most 64 seeds")
    val groupMasks = tagged.groupBy("off")
      .agg(expr("bit_or(bit)").as("gmask")).localCheckpoint()
    var state = tagged.select(col("seed").as("node"), col("bit").as("mask"))
      .groupBy("node").agg(expr("bit_or(mask)").as("mask"))
      .localCheckpoint()
    var frontier = state
    // (dist, gained-bit union) — 1 lazy row per level over the level's
    // already-checkpointed gains (nothing re-materializes).
    val gains = scala.collection.mutable.ArrayBuffer(
      state.agg(expr("bit_or(mask)").as("gained"))
        .select(lit(0).as("dist"), col("gained")))
    var h = 0
    while (h < maxHops && !frontier.isEmpty) {
      h += 1
      val pushed = frontier.join(adj, col("node") === col("src"))
        .groupBy(col("dst").as("node")).agg(expr("bit_or(mask)").as("pmask"))
      val gained = pushed
        .join(state.withColumnRenamed("mask", "seen"), Seq("node"), "left")
        .select(col("node"),
          col("pmask").bitwiseAND(bitwise_not(coalesce(col("seen"), lit(0L))))
            .as("mask"))
        .filter(col("mask") =!= 0L)
        .localCheckpoint()
      state = state.unionAll(gained)
        .groupBy("node").agg(expr("bit_or(mask)").as("mask"))
        .localCheckpoint()
      gains += gained.agg(coalesce(expr("bit_or(mask)"), lit(0L)).as("gained"))
        .select(lit(h).as("dist"), col("gained"))
      frontier = gained
    }
    groupMasks.join(gains.reduce(_ unionAll _),
        col("gmask").bitwiseAND(col("gained")) =!= 0L, "left")
      .groupBy("off")
      .agg(coalesce(max("dist"), lit(0)).as("pecc"))
  }
}
