package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-checks for the OLAP-shape queries (q69-q74): internal
  * consistency invariants the DuckDB oracle can't express (it only
  * compares final values). */
class OlapShapesSpec extends SparkSpec {

  test("pivot counts re-aggregate to the conditional-counts query") {
    val pivot = WarehouseAnalytics.statusPivot(spark, sf001)
      .select(col("o_orderpriority"),
        (col("f_n") + col("o_n") + col("p_n")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cond = MarketAnalytics.condCounts(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pivot == cond)
  }

  test("rollup levels are internally consistent") {
    val rows = WarehouseAnalytics.revenueRollup(spark, sf001).collect()
    val grand = rows.filter(_.getInt(2) == 2)
    assert(grand.length == 1)
    val l0Items = rows.filter(_.getInt(2) == 0).map(_.getLong(3)).sum
    val l1Items = rows.filter(_.getInt(2) == 1).map(_.getLong(3)).sum
    assert(l0Items == grand.head.getLong(3) && l1Items == grand.head.getLong(3))
  }

  test("correlationPanel bounds the pair stage to the most-active keys") {
    import spark.implicits._
    // 8 keys whose integer-cents activity strictly increases with the key
    // index; cap 5 must keep exactly k3..k7 (no silent truncation — the
    // retained set is the documented deterministic top-by-activity).
    val daily = (for (k <- 0 until 8; d <- 0 until 10)
      yield (s"k$k", d, (k + 1) * 10.0 + d % 3)).toDF("key", "d", "v")
    val capped = MarketAnalytics.correlationPanel(daily, "key", "d", "v", maxKeys = 5)
      .collect()
    val keysSeen = capped.flatMap(r => Seq(r.getString(0), r.getString(1))).toSet
    assert(keysSeen == Set("k3", "k4", "k5", "k6", "k7"))
    assert(capped.length == 10) // C(5,2) pairs, each over all 10 dates
    assert(capped.forall(_.getLong(3) == 10))
    // at-or-under the cap the matrix is the full unfiltered one
    val full = MarketAnalytics.correlationPanel(daily, "key", "d", "v", maxKeys = 8)
    assert(full.count() == 28) // C(8,2)
  }

  test("ntile quartile sizes within a segment differ by at most one") {
    WarehouseAnalytics.revenueQuartiles(spark, sf001).collect()
      .groupBy(_.getString(0)).foreach { case (_, qs) =>
        val sizes = qs.map(_.getLong(2))
        assert(sizes.max - sizes.min <= 1)
        assert(qs.map(_.getInt(1)).sorted.toSeq == (1 to qs.length).toSeq)
      }
  }

  test("gap fill emits a dense spine with carried values") {
    val rows = WarehouseAnalytics.monthlyGapFill(spark, sf001, maxKey = 5).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, ms) =>
      // dense: every month present exactly once per key
      assert(ms.map(_.getDate(1)).distinct.length == ms.length)
      // carried: a gap month repeats the previous filled value
      val sorted = ms.sortBy(_.getDate(1).toString)
      sorted.sliding(2).foreach {
        case Array(prev, cur) if cur.getInt(3) == 1 =>
          assert(cur.getDouble(2) == prev.getDouble(2))
        case _ =>
      }
    }
  }

  test("max drawdown is in [-1, 0] and volatility is non-negative") {
    val dd = MarketAnalytics.maxDrawdown(spark, sf001).collect()
    assert(dd.nonEmpty)
    dd.foreach { r =>
      val d = r.getDouble(3)
      assert(d <= 0.0 && d >= -1.0, s"drawdown out of range: $d")
    }
    val vol = MarketAnalytics.returnVolatility(spark, sf001).collect()
    assert(vol.nonEmpty)
    vol.foreach { r =>
      assert(r.getLong(1) >= 2)
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("funnel stage counts are non-increasing") {
    val counts = EventWindows.eventFunnel(spark, sf001)
      .orderBy("stage").collect().map(_.getLong(1))
    assert(counts.length == 3)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("cohort retention offset-0 covers every user exactly once") {
    val rows = EventWindows.cohortRetention(spark, sf001).collect()
    val day0 = rows.filter(_.getInt(1) == 0).map(_.getLong(2)).sum
    val users = graft.model.Tables.events(spark, sf001)
      .select("user_id").distinct().count()
    assert(day0 == users)
    assert(rows.forall(_.getInt(1) >= 0))
  }

  test("RSI stays in [0, 100] and only full frames are emitted") {
    val rows = MarketAnalytics.rsi(spark, sf001, n = 5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getDouble(4)
      assert(v >= 0.0 && v <= 100.0, s"rsi out of range: $v")
    }
    // Frame length 5 needs 5 changes = 6 orders: customers with fewer
    // orders must be absent entirely.
    import org.apache.spark.sql.functions._
    val small = graft.model.Tables.orders(spark, sf001)
      .groupBy("o_custkey").count().filter(col("count") < 6)
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => !small.contains(r.getLong(0))))
  }

  test("weekly OHLC bars bracket open/close and reconcile with raw orders") {
    import org.apache.spark.sql.functions._
    val bars = MarketAnalytics.weeklyOhlc(spark, sf001).collect()
    assert(bars.nonEmpty)
    bars.foreach { r =>
      val (open, high, low, close) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(high >= low && high >= open && high >= close &&
        low <= open && low <= close)
    }
    val nBars = bars.map(_.getLong(6)).sum
    assert(nBars == graft.model.Tables.orders(spark, sf001).count())
  }

  test("market breadth counts partition the change rows and breadth is in [-1, 1]") {
    val rows = MarketAnalytics.marketBreadth(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (up, down, flat, b) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(up + down + flat > 0)
      assert(b >= -1.0 && b <= 1.0)
      assert(math.abs(b - (up - down).toDouble / (up + down + flat)) < 1e-6)
    }
  }

  test("longest up-streak is bounded by the customer's change count") {
    val streaks = MarketAnalytics.longestUpStreak(spark, sf001).collect()
    assert(streaks.nonEmpty)
    streaks.foreach { r =>
      val (longest, n) = (r.getInt(1), r.getInt(2))
      assert(longest >= 0 && longest <= n - 1,
        s"streak $longest out of range for $n orders")
    }
  }

  test("HHI sits in [1/n, 1] and top share never exceeds it... proportionally") {
    val rows = WarehouseAnalytics.hhiConcentration(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, top, hhi) = (r.getInt(1), r.getDouble(3), r.getDouble(4))
      assert(hhi >= 1.0 / n - 1e-6 && hhi <= 1.0 + 1e-6,
        s"hhi $hhi out of range for n=$n")
      // HHI ≥ top² (the top supplier alone contributes top²).
      assert(hhi >= top * top - 1e-6)
    }
  }

  test("monthly ranks are a permutation and shifts cancel per month pair") {
    val rows = WarehouseAnalytics.rankShift(spark, sf001).collect()
    assert(rows.nonEmpty)
    // Within one month, emitted ranks are distinct (the order is unique).
    rows.groupBy(_.getDate(1)).foreach { case (_, rs) =>
      val rnks = rs.map(_.getInt(3))
      assert(rnks.distinct.length == rnks.length)
    }
    rows.foreach(r => assert(r.getInt(5) == r.getInt(4) - r.getInt(3)))
  }

  test("percentile report: pct_rank and cume are in [0,1] and monotone together") {
    val rows = WarehouseAnalytics.percentileReport(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, c) = (r.getDouble(3), r.getDouble(4))
      assert(p >= 0.0 && p <= 1.0 && c > 0.0 && c <= 1.0)
    }
    // Per segment: sorting by revenue must sort both measures.
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.getDouble(2), r.getLong(1)))
      val ps = sorted.map(_.getDouble(3))
      assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
    }
  }

  test("TWAP lies between the month's min and max day-close price") {
    import org.apache.spark.sql.functions._
    val li = graft.model.Tables.lineitem(spark, sf001)
      .groupBy(col("l_suppkey"), col("l_shipdate").cast("date").as("d"))
      .agg(max(struct(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("px")))
        .getField("px").as("px"))
      .groupBy(col("l_suppkey"), trunc(col("d"), "MM").as("month"))
      .agg(min("px").as("lo"), max("px").as("hi"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getLong(3))).toMap
    val rows = MarketAnalytics.twap(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = li((r.getLong(0), r.getDate(1).toString))
      val t = r.getDouble(4) * 100 // back to cents
      assert(t >= lo - 0.01 && t <= hi + 0.01,
        s"twap $t outside [$lo, $hi]")
    }
  }
}
