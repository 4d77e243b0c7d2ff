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
