package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional scan
  * pruning.
  *
  * At 100 TB the dominant cost of a selective query is how many files
  * its predicates let the scan SKIP via footer min/max statistics. A
  * sort by one column gives perfect pruning on that column and none on
  * any other; interleaving the bits of several range-bucketed columns
  * gives every participating column partial locality — each output
  * file owns a compact z-range, i.e. a small hyper-rectangle of the
  * original dimensions, so a predicate on ANY subset of the z-columns
  * skips most files. This is the layout trick behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`, built here from plain Spark primitives.
  *
  * Mechanics, all declarative and codegen-friendly:
  *  1. each dimension is ranked into `2^bits` quantile buckets —
  *     boundaries come from `approxQuantile` (driver-side t-digest
  *     over a single pass, metadata-sized result) and ship to
  *     executors as an array literal; the per-row bucket is
  *     `size(filter(boundaries, b -> value >= b))`, a branch-free
  *     codegen'd scan over ≤ 2^bits doubles (quantile buckets, not
  *     fixed-width ones, so skewed columns still spread evenly);
  *  2. bucket bits interleave into one LONG z-value with
  *     shift/and/or column arithmetic (no UDF);
  *  3. `repartitionByRange(z)` + `sortWithinPartitions(z)` — one
  *     shuffle, after which every partition/file covers a contiguous
  *     z-range.
  *
  * NULLs sort into bucket 0 (the lowest z-region) — deterministic and
  * prunable like any other value. Boundary placement only affects
  * balance, never correctness: rows are complete and unmodified, the
  * z-value is dropped after the sort.
  */
object ZOrder {

  /** Bucket index of `c` against sorted cut points `bounds`:
    * the number of cut points ≤ value, 0..bounds.length. NULLs land in
    * bucket 0. Pure `functions._` — stays inside whole-stage codegen. */
  private[operators] def bucketOf(c: Column, bounds: Array[Double]): Column =
    size(filter(typedlit(bounds.toSeq),
      b => c.cast("double").isNotNull && c.cast("double") >= b)).cast("long")

  /** Interleave `bits` low bits of each bucket column into one LONG:
    * bit `i` of dimension `j` lands at position `i·k + j` (k = number
    * of dimensions) — the Morton curve. */
  private[operators] def interleave(buckets: Seq[Column], bits: Int): Column = {
    val k = buckets.size
    buckets.zipWithIndex.foldLeft(lit(0L)) { case (acc, (b, j)) =>
      (0 until bits).foldLeft(acc) { case (a, i) =>
        a.bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * k + j))
      }
    }
  }

  /** 2-D Hilbert index of two `bits`-bit bucket columns — the
    * xy→d walk of the classic iterative algorithm (per level: quadrant
    * selection `d += s²·((3·rx) xor ry)` then the reflect/rotate of the
    * lower quadrants), expressed as a fold over bit levels with
    * `when()` arithmetic so it stays inside whole-stage codegen. Unlike
    * the Morton curve, CONSECUTIVE Hilbert cells are always
    * grid-adjacent (no diagonal jumps across the plane), so a
    * contiguous d-range covers a tighter rectangle — the property the
    * spec pins. */
  private[operators] def hilbert2D(bx: Column, by: Column, bits: Int): Column = {
    var x = bx
    var y = by
    var d = lit(0L)
    var level = bits - 1
    while (level >= 0) {
      val s = 1L << level
      val rx = when(x.bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      val ry = when(y.bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      d = d + lit(s * s) * ((lit(3L) * rx).bitwiseXOR(ry))
      // rotate/reflect the lower-left and lower-right quadrants
      val nx = when(ry === 0, when(rx === 1, lit(s - 1) - y).otherwise(y))
        .otherwise(x)
      val ny = when(ry === 0, when(rx === 1, lit(s - 1) - x).otherwise(x))
        .otherwise(y)
      x = nx
      y = ny
      level -= 1
    }
    d
  }

  /** Re-layout `df` along the 2-D Hilbert curve of exactly two columns —
    * same quantile bucketing, shuffle count (one range exchange) and
    * row-preservation contract as [[zorderBy]], with strictly better
    * locality for 2-D predicates (use [[zorderBy]] for 3+ dims, where
    * the Morton interleave generalizes directly). */
  def hilbertBy(df: DataFrame, colX: String, colY: String, bits: Int = 8,
                numPartitions: Int = 0): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val n = 1 << bits
    val qs = (1 until n).map(_.toDouble / n).toArray
    val allBounds = df.stat.approxQuantile(Array(colX, colY), qs, 0.001)
    val d = hilbert2D(bucketOf(col(colX), allBounds(0)),
      bucketOf(col(colY), allBounds(1)), bits)
    val np =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.withColumn("_graft_z", d)
      .repartitionByRange(np, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
  }

  /** Re-layout `df` along the Morton curve of `cols`.
    *
    * `bits` per dimension (default 8 → 256 quantile buckets per dim;
    * `k·bits ≤ 63` enforced). `numPartitions` defaults to the session
    * shuffle parallelism. Adds exactly ONE shuffle (the range
    * repartition); `approxQuantile` is a separate single-pass
    * aggregation whose result is driver metadata, never a join side.
    * Write the result with any sink — each parquet file then carries
    * tight min/max footer ranges on EVERY z-column. */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int = 8,
               numPartitions: Int = 0): DataFrame = {
    require(cols.nonEmpty, "zorderBy needs at least one column")
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    require(cols.size * bits <= 63,
      s"${cols.size} dims × $bits bits exceeds the 63-bit z budget")
    val n = 1 << bits
    val qs = (1 until n).map(_.toDouble / n).toArray
    // one approxQuantile pass over all dims at once (driver metadata)
    val allBounds = df.stat.approxQuantile(cols.toArray, qs, 0.001)
    val z = interleave(
      cols.zip(allBounds).map { case (c, bounds) => bucketOf(col(c), bounds) },
      bits)
    val np =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.withColumn("_graft_z", z)
      .repartitionByRange(np, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
  }
}
