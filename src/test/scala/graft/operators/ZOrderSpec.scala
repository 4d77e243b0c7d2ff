package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: Morton interleave arithmetic, row preservation, and
  * the actual pruning payoff — partition-level min/max ranges must stay
  * tight on BOTH dimensions, where a single-column sort prunes only its
  * own column.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave places bit i of dim j at position i*k + j") {
    val row = Seq((3L, 5L)).toDF("bx", "by")
      .select(ZOrder.interleave(Seq(col("bx"), col("by")), 4).as("z"))
      .collect().head
    // x=0011, y=0101 -> z bits: pos0=x0=1, pos1=y0=1, pos2=x1=1,
    // pos3=y1=0, pos4=x2=0, pos5=y2=1, pos6=x3=0, pos7=y3=0 -> 39
    assert(row.getLong(0) == 39L)
  }

  test("bucketOf ranks against sorted cut points; nulls land in bucket 0") {
    val bounds = Array(10.0, 20.0, 30.0)
    val got = Seq(Some(5), Some(10), Some(25), Some(99), None)
      .toDF("v")
      .select(ZOrder.bucketOf(col("v"), bounds).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 2L, 3L, 0L))
  }

  // 100x100 grid, every cell once, input order scrambled by a hash so
  // the layout work is real
  private def grid = spark.range(10000)
    .select((col("id") / 100).cast("int").as("x"),
      (col("id") % 100).cast("int").as("y"),
      col("id").as("payload"))
    .orderBy(xxhash64(col("id")))

  private def partExtents(df: org.apache.spark.sql.DataFrame) =
    df.select(col("x").cast("int"), col("y").cast("int"))
      .as[(Int, Int)]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          var minx = Int.MaxValue; var maxx = Int.MinValue
          var miny = Int.MaxValue; var maxy = Int.MinValue
          it.foreach { case (x, y) =>
            if (x < minx) minx = x; if (x > maxx) maxx = x
            if (y < miny) miny = y; if (y > maxy) maxy = y
          }
          Iterator.single((minx, maxx, miny, maxy))
        }
      }.collect().toSeq

  test("hilbert2D is a bijection whose consecutive cells are grid-adjacent") {
    val bits = 4
    val n = 1 << bits
    val cells = spark.range(n.toLong * n)
      .select((col("id") / n).cast("long").as("bx"),
        (col("id") % n).cast("long").as("by"))
      .select(col("bx"), col("by"),
        ZOrder.hilbert2D(col("bx"), col("by"), bits).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // bijection onto [0, 4^bits)
    assert(cells.map(_._3).distinct.length == n * n)
    assert(cells.forall(c => c._3 >= 0 && c._3 < n.toLong * n))
    // THE Hilbert property: walking d = 0,1,2,... moves one grid step
    // at a time (Manhattan distance exactly 1) — the Morton curve
    // violates this with diagonal jumps at every power-of-two boundary
    val byD = cells.sortBy(_._3)
    byD.sliding(2).foreach { case Array((x1, y1, d1), (x2, y2, d2)) =>
      assert(d2 == d1 + 1)
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) == 1,
        s"non-adjacent step at d=$d1 -> $d2: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("hilbertBy preserves rows with the same layout contract as zorderBy") {
    val h = ZOrder.hilbertBy(grid, "x", "y", bits = 4, numPartitions = 16)
    assert(h.columns.toSeq == Seq("x", "y", "payload"))
    val chk = h.agg(count(lit(1)), sum("payload")).collect().head
    assert(chk.getLong(0) == 10000L && chk.getLong(1) == 49995000L)
    // the corner box stays confined, like (or tighter than) z-order
    val ext = partExtents(h)
    val boxH = ext.count { case (nx, _, ny, _) => nx < 25 && ny < 25 }
    assert(boxH <= 6, s"hilbert box overlap: $boxH of ${ext.size}")
  }

  test("zorderBy preserves rows and prunes on every interleaved dimension") {
    val z = ZOrder.zorderBy(grid, Seq("x", "y"), bits = 4, numPartitions = 16)
    // row preservation: same multiset (count + payload checksum), no
    // helper column left behind
    assert(z.columns.toSeq == Seq("x", "y", "payload"))
    val chk = z.agg(count(lit(1)), sum("payload")).collect().head
    assert(chk.getLong(0) == 10000L && chk.getLong(1) == 49995000L)

    val zExt = partExtents(z)
    assert(zExt.size > 8, s"expected ~16 non-empty partitions, got ${zExt.size}")
    // corner box x<25 AND y<25: a z-layout confines it to a few
    // partitions (the box is one low-z hyper-rectangle)
    // (quantile cuts and range-partition sampling don't align exactly
    // with 25, so a couple of straddlers are expected beyond the ideal
    // single low-z partition)
    val boxZ = zExt.count { case (nx, xx, ny, xy) => nx < 25 && ny < 25 }
    assert(boxZ <= 6, s"z-order box overlap: $boxZ of ${zExt.size}")
    // y-only predicate y<25: still prunes under z-order (y bits are in
    // the z-value)...
    val yZ = zExt.count { case (_, _, ny, _) => ny < 25 }
    assert(yZ <= 10, s"z-order y-band overlap: $yZ of ${zExt.size}")
    // ...whereas an x-sorted layout cannot prune y at all: every
    // partition spans the full y domain
    val xSorted = grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x")
    val xExt = partExtents(xSorted)
    assert(xExt.forall { case (_, _, ny, xy) => ny < 25 && xy >= 75 },
      "x-sorted control should span full y range in every partition")
  }
}
