package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics on hand-built series: at-or-before matching,
  * same-timestamp inclusion, no-match nulls, key isolation.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf picks the latest right row at-or-before each left ts") {
    val trades = Seq(
      ("A", 1, "t1"), ("A", 5, "t2"), ("A", 10, "t3"), ("B", 3, "t4")
    ).toDF("k", "ts", "trade")
    val quotes = Seq(
      ("A", 1, 100.0), ("A", 4, 104.0), ("A", 10, 110.0), ("B", 9, 900.0)
    ).toDF("k", "ts", "px")
      .select(col("k"), col("ts").as("qts"), col("px").as("quote_px"))
    val out = AsOfJoin.asOf(trades, quotes, "k", "ts", "qts",
        Seq("quote_px"), Seq(col("trade")))
      .orderBy("k", "ts")
      .collect().map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq == Seq(
      ("A", 1, Some(100.0)),   // same-ts quote matches (<=)
      ("A", 5, Some(104.0)),   // latest at-or-before
      ("A", 10, Some(110.0)),
      ("B", 3, None)))         // B's only quote is later → null
  }

  test("all value columns come from the SAME matched row (null field stays null)") {
    // The latest quote before ts=5 has px=NULL: the output must carry
    // (px=null, venue="x2") from that one row — not stitch px=101.0 from
    // the older row with venue from the newer one.
    val trades = Seq(("A", 5, "t1")).toDF("k", "ts", "trade")
    val quotes = Seq(
      ("A", 1, Some(101.0), "x1"),
      ("A", 4, None, "x2")
    ).toDF("k", "qts", "px", "venue")
      .select(col("k"), col("qts"), col("px").as("quote_px"), col("venue").as("quote_venue"))
    val out = AsOfJoin.asOf(trades, quotes, "k", "ts", "qts",
        Seq("quote_px", "quote_venue"), Seq(col("trade")))
      .collect()
    assert(out.length == 1)
    assert(out(0).isNullAt(out(0).fieldIndex("quote_px")))
    assert(out(0).getAs[String]("quote_venue") == "x2")
  }

  test("asOfWithin nulls matches older than the staleness bound") {
    val trades = Seq(
      ("A", "2024-03-01", "t1"),  // quote 2 days old → kept, staleness 2
      ("A", "2024-03-20", "t2"),  // same quote now 21 days old → nulled
      ("B", "2024-03-05", "t3")   // no quote at all → nulled
    ).toDF("k", "ts", "trade").withColumn("ts", col("ts").cast("date"))
    val quotes = Seq(("A", "2024-02-28", 100.0))
      .toDF("k", "qts", "quote_px").withColumn("qts", col("qts").cast("date"))
    val out = AsOfJoin.asOfWithin(trades, quotes, "k", "ts", "qts",
        Seq("quote_px"), Seq(col("trade")), maxDays = 7)
      .orderBy("k", "ts")
      .collect().map { r =>
        (r.getString(0),
          if (r.isNullAt(r.fieldIndex("quote_px"))) None
          else Some(r.getDouble(r.fieldIndex("quote_px"))),
          if (r.isNullAt(r.fieldIndex("staleness_days"))) None
          else Some(r.getInt(r.fieldIndex("staleness_days"))))
      }
    assert(out.toSeq == Seq(
      ("A", Some(100.0), Some(2)),
      ("A", None, None),
      ("B", None, None)))
  }
}
