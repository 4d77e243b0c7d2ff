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
                   maxHops: Int): DataFrame = {
    require(maxHops >= 0 && maxHops <= 16, s"maxHops out of [0,16]: $maxHops")
    val adj = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint()
    var visited = seeds.select(col("seed"), col("seed").as("node"),
      lit(0).as("dist")).localCheckpoint()
    var frontier = visited
    var h = 0
    while (h < maxHops && !frontier.isEmpty) {
      h += 1
      val next = frontier.join(adj, col("node") === col("src"))
        .select(col("seed"), col("dst").as("node"))
        .distinct()
        .join(visited.select("seed", "node"), Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"), lit(h).as("dist"))
        .localCheckpoint()
      visited = visited.unionAll(next).localCheckpoint()
      frontier = next
    }
    visited.select(col("seed"), col("node"), col("dist").cast("int").as("dist"))
  }
}
