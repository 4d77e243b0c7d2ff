package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval join — the range-join shape Spark's
  * planner has no native strategy for: `p.t BETWEEN i.start AND i.end`
  * (plus key equality) plans as a BroadcastNestedLoopJoin or a cartesian
  * product, both quadratic in the key-group size. The classic fix (the
  * same binning production engines apply under their range-join hints):
  *
  *   - map every point to the fixed-width time bucket containing it;
  *   - explode every interval to the buckets it COVERS (bounded by
  *     `interval_length / bucketWidth + 1` rows — pick the width near
  *     the typical interval length so the blow-up stays ~2×);
  *   - equi-join on (keys..., bucket) — a plain shuffled hash join that
  *     partitions evenly at any scale — and re-check the EXACT
  *     containment predicate on the survivors.
  *
  * Every qualifying (point, interval) pair is emitted exactly once (a
  * point lives in exactly one bucket), so no distinct pass is needed.
  * The equality spec pins the operator to the naive non-equi join on
  * boundary-heavy fixtures; a plan spec asserts no nested-loop/cartesian
  * node survives.
  */
object RangeJoin {

  /** Inner-join `points` to `intervals` on `keys` equality plus
    * `points(pointCol) BETWEEN intervals(startCol) AND intervals(endCol)`
    * (inclusive ends, DATE columns). Column names other than `keys` must
    * be disjoint between the two sides. `bucketDays` tunes the bin width:
    * each interval emits `len/bucketDays + 1` bucket rows. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pointCol: String,
                      startCol: String, endCol: String,
                      bucketDays: Int = 7): DataFrame = {
    require(bucketDays > 0, s"bucketDays must be positive, got $bucketDays")
    val overlap = intervals.columns.toSet
      .intersect(points.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns must be disjoint across sides; both have $overlap")
    def bucketOf(c: Column): Column =
      floor(datediff(c, lit(java.sql.Date.valueOf("1970-01-01"))) / bucketDays)
    val pb = points.withColumn("__graft_bkt", bucketOf(col(pointCol)))
    val ib = intervals.withColumn("__graft_bkt",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    pb.join(ib, keys :+ "__graft_bkt")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__graft_bkt")
  }
}
