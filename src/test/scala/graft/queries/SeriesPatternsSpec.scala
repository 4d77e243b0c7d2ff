package graft.queries

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Value-level properties for the series/pattern tier (q212–q216): the
  * DuckDB oracle pins cross-engine parity; these pin the MATH — the
  * CUSUM linearization against Page's sequential recursion, the
  * interpolation against its neighbor bounds, the pattern classes
  * against direct path filters, Spearman against a BigInt replay, and
  * the bitmask encoding against per-bit membership counts.
  */
class SeriesPatternsSpec extends SparkSpec {

  test("linearized CUSUM equals Page's sequential recursion") {
    val rows = WarehouseAnalytics.cusumShift(spark, sf001)
      .collect()
      .groupBy(_.getAs[String]("priority"))
    assert(rows.nonEmpty)
    rows.foreach { case (prio, rs) =>
      val series = rs.sortBy(_.getAs[java.sql.Date]("day").toString)
      val mu = series.head.getAs[Long]("mu")
      val k = mu / 50
      var sUp = 0L; var sDn = 0L
      series.foreach { r =>
        val px = r.getAs[Long]("px")
        sUp = math.max(0L, sUp + px - mu - k)
        sDn = math.max(0L, sDn + mu - px - k)
        assert(r.getAs[Long]("s_up") == sUp, s"$prio s_up at ${r.get(1)}")
        assert(r.getAs[Long]("s_dn") == sDn, s"$prio s_dn at ${r.get(1)}")
        assert((r.getAs[Int]("alarm_up") == 1) == (sUp > mu / 2))
        assert((r.getAs[Int]("alarm_dn") == 1) == (sDn > mu / 2))
      }
    }
  }

  test("gap-fill spine is contiguous and fills stay between neighbors") {
    val out = MarketAnalytics.gapFillDaily(spark, sf001).collect()
    assert(out.exists(_.getAs[Int]("is_observed") == 0),
      "sf0.001 daily series should actually have gaps")
    out.groupBy(_.getAs[String]("priority")).foreach { case (prio, rs) =>
      val days = rs.map(_.getAs[java.sql.Date]("day").toLocalDate)
        .sortBy(_.toEpochDay)
      // contiguous calendar spine, endpoints observed
      assert(days.zip(days.tail).forall { case (a, b) => a.plusDays(1) == b },
        s"$prio spine has a hole")
      val byDay = rs.map(r => r.getAs[java.sql.Date]("day").toLocalDate -> r).toMap
      assert(byDay(days.head).getAs[Int]("is_observed") == 1)
      assert(byDay(days.last).getAs[Int]("is_observed") == 1)
      // every filled value lies in the closed interval of its neighbors
      val obs = days.filter(d => byDay(d).getAs[Int]("is_observed") == 1)
      days.filter(d => byDay(d).getAs[Int]("is_observed") == 0).foreach { d =>
        val prev = obs.filter(_.isBefore(d)).last
        val next = obs.filter(_.isAfter(d)).head
        val (pv, nv, fv) = (byDay(prev).getAs[Long]("px_filled"),
          byDay(next).getAs[Long]("px_filled"),
          byDay(d).getAs[Long]("px_filled"))
        assert(fv >= math.min(pv, nv) && fv <= math.max(pv, nv),
          s"$prio $d fill $fv outside [$pv, $nv]")
        // exact weighted-sum replay
        val span = next.toEpochDay - prev.toEpochDay
        val want = (pv * (next.toEpochDay - d.toEpochDay) +
          nv * (d.toEpochDay - prev.toEpochDay)) / span
        assert(fv == want, s"$prio $d")
      }
    }
  }

  test("session pattern classes partition the session population") {
    val assignments = EventWindows.sessionPathAssignments(spark, sf001)
      .select("path", "n_events").collect()
    val out = EventWindows.sessionPatternClasses(spark, sf001).collect()
    assert(out.map(_.getAs[Long]("n_sessions")).sum == assignments.length)
    // replay the cascade on the raw paths
    val want = assignments.groupBy { r =>
      val (p, n) = (r.getString(0), r.getInt(1))
      val iv = p.indexOf("view")
      if (iv >= 0 && p.indexOf("purchase", iv) >= 0) "view_to_purchase"
      else if (p.contains("purchase")) "blind_purchase"
      else if (p.endsWith("error")) "error_exit"
      else if (n == 1) "bounce"
      else if (n >= 5) "engaged_browse"
      else "browse"
    }.view.mapValues(_.length.toLong).toMap
    val got = out.map(r =>
      r.getAs[String]("class") -> r.getAs[Long]("n_sessions")).toMap
    assert(got == want)
    out.foreach { r =>
      assert(r.getAs[Long]("avg_events_ppm") ==
        r.getAs[Long]("n_events_total") * 1000000L / r.getAs[Long]("n_sessions"))
    }
  }

  test("spearman matches a BigInt replay and detects the planted monotone") {
    val out = WarehouseAnalytics.spearmanSegments(spark, sf001).collect()
    assert(out.nonEmpty)
    val data = Tables.orders(spark, sf001)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      .join(Tables.customer(spark, sf001), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_custkey"),
        round(col("c_acctbal") * 100, 0).cast("long").as("bal"), col("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    out.foreach { r =>
      val seg = r.getAs[String]("c_mktsegment")
      val xs = data(seg)
      val rx = xs.sortBy(t => (t._3, t._2)).zipWithIndex
        .map { case (t, i) => t._2 -> (i + 1L) }.toMap
      val ry = xs.sortBy(t => (t._4, t._2)).zipWithIndex
        .map { case (t, i) => t._2 -> (i + 1L) }.toMap
      val n = BigInt(xs.length)
      val sd2 = xs.map(t => { val d = BigInt(rx(t._2) - ry(t._2)); d * d }).sum
      val want = BigInt(1000000) - (6 * sd2 * 1000000) / (n * (n * n - 1))
      assert(BigInt(r.getAs[Long]("rho_ppm")) == want, s"segment $seg")
      assert(r.getAs[Long]("sum_d2") == sd2.toLong)
      assert(math.abs(r.getAs[Long]("rho_ppm")) <= 1000000L)
    }
  }

  test("event combo masks decode consistently and count every user-week") {
    val out = EventWindows.eventTypeCombos(spark, sf001).collect()
    assert(out.length > 1, "weekly scope should yield multiple combos")
    val nUserWeeks = Tables.events(spark, sf001)
      .select(col("user_id"), date_trunc("week", col("ts")))
      .distinct().count()
    assert(out.map(_.getAs[Long]("n_user_weeks")).sum == nUserWeeks)
    val labels = Seq(1 -> "click", 2 -> "error", 4 -> "purchase",
      8 -> "signup", 16 -> "view")
    out.foreach { r =>
      val mask = r.getAs[Int]("mask")
      assert(mask >= 1 && mask <= 31)
      assert(r.getAs[Int]("n_types") == Integer.bitCount(mask))
      val want = labels.collect { case (b, l) if (mask & b) != 0 => l }
        .mkString("+")
      assert(r.getAs[String]("combo") == want)
    }
    // per-bit membership cross-check: user-weeks containing a purchase
    val purchaseWeeks = Tables.events(spark, sf001)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("week", col("ts")))
      .distinct().count()
    assert(out.filter(r => (r.getAs[Int]("mask") & 4) != 0)
      .map(_.getAs[Long]("n_user_weeks")).sum == purchaseWeeks)
  }

  test("unknown event type fails loudly instead of aliasing into view") {
    import spark.implicits._
    val known = Seq("click", "error", "purchase", "signup", "view")
      .toDF("event_type").select(EventWindows.eventTypeBit.as("bv"))
      .collect().map(_.getLong(0))
    assert(known.toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    val ex = intercept[Exception] {
      Seq("scroll").toDF("event_type")
        .select(EventWindows.eventTypeBit.as("bv")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("unknown event_type")))
  }
}
