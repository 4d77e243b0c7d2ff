package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the step
  * that turns near-duplicate PAIRS into dedup GROUPS (keep one
  * representative per component) in a training-data pipeline.
  *
  * Each iteration is one distributed join + aggregation; lineage is cut
  * per iteration (`localCheckpoint`) so plans stay bounded. Convergence
  * takes at most the graph diameter — near-dup graphs are
  * shallow (duplicates of a duplicate), so this is a handful of rounds.
  * At extreme scale the large-star/small-star variant halves rounds; the
  * join shape is identical.
  */
object ConnectedComponents {

  /** (node, label) with label = min node id of the component. `edges` is
    * undirected input (one row per pair, any orientation). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       maxIter: Int = 20): DataFrame = {
    // Materialize the edge input ONCE before symmetrizing: the union's
    // two branches would otherwise each re-evaluate the (potentially
    // expensive — e.g. a whole MinHash verify) upstream plan.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val sym = e
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("node").as("dst"), col("label").as("dlabel")), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min("dlabel").as("nbr_label"))
      val updated = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("new_label"))
        .localCheckpoint()
      // Convergence is checked every OTHER round: the count is a full
      // extra job over the label set, and near-dup graphs are shallow, so
      // paying at most one redundant propagation round halves the number
      // of driver-blocking jobs versus checking per iteration.
      if (i % 2 == 1 || i == maxIter - 1)
        changed = updated.filter(col("new_label") < col("label")).count()
      labels = updated.select(col("node"), col("new_label").as("label"))
      i += 1
    }
    labels
  }
}
