package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming transforms driven through MemoryStream micro-batches:
  * windowed aggregation, late-data dedup, and explicit-state
  * sessionization (closed-session emission on gap crossing).
  */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  case class EvRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)

  /** Hour-aligned offset away from epoch 0: a row at exactly the initial
    * watermark (epoch 0) is dropped as late by stateful operators. */
  private val baseMin = 1020L
  private def at(min: Long) = new java.sql.Timestamp((baseMin + min) * 60000L)
  private def mins(t: java.sql.Timestamp) = t.getTime / 60000L - baseMin
  private def ev(id: Long, min: Long, user: Long = 1L, typ: String = "click",
                 v: Double = 1.0) = EvRow(id, at(min), user, typ, v, "{}")

  private def drain(q: StreamingQuery): Unit = {
    q.processAllAvailable()
    q.stop()
  }

  test("statefulSessionPaths emits the batch path string on session close") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[EventStream.PathEv]
    val q = EventStream.statefulSessionPaths(in.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("spaths").outputMode("append").start()
    def pev(id: Long, min: Long, user: Long, typ: String) =
      EventStream.PathEv(user, at(min), id, typ)
    // user 1: view>click>purchase, then a 100-min gap opens session 2;
    // user 2: a lone view in its own session
    in.addData(pev(1, 0, 1L, "view"), pev(2, 5, 1L, "click"),
      pev(3, 10, 1L, "purchase"), pev(4, 2, 2L, "view"))
    in.addData(pev(5, 110, 1L, "view"), pev(6, 115, 2L, "click"))
    // push the watermark far enough to time out every open session
    in.addData(pev(7, 400, 3L, "view"))
    drain(q)
    val rows = spark.table("spaths").collect()
      .map(r => (r.getLong(0), mins(r.getTimestamp(1)), r.getInt(2),
        r.getString(3))).toSet
    // nothing here exceeds the path cap → no row may claim truncation
    assert(spark.table("spaths").collect().forall(!_.getBoolean(4)))
    assert(rows.contains((1L, 0L, 3, "view>click>purchase")))
    assert(rows.contains((1L, 110L, 1, "view")))
    // user 2's 113-min gap splits two singleton sessions
    assert(rows.contains((2L, 2L, 1, "view")))
    assert(rows.contains((2L, 115L, 1, "click")))
  }

  test("statefulSessionPaths caps per-session path state") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[EventStream.PathEv]
    val q = EventStream.statefulSessionPaths(in.toDS(), gapMs = 30 * 60000L,
        maxPathLen = 3)
      .writeStream.format("memory").queryName("spcap").outputMode("append").start()
    in.addData((0 until 6).map(i =>
      EventStream.PathEv(1L, at(i), i.toLong, s"e$i")): _*)
    in.addData(EventStream.PathEv(9L, at(500), 99L, "view")) // advance watermark
    drain(q)
    val sess = spark.table("spcap").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getInt(2), r.getString(3), r.getBoolean(4)))
    // 6 events counted, path truncated to the first 3 types — and the
    // divergence from the uncapped batch twin is FLAGGED, not silent
    assert(sess.toSeq == Seq((6, "e0>e1>e2", true)))
  }

  test("tumblingCounts aggregates per hour bucket and type") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[EvRow]
    val q = EventStream.tumblingCounts(in.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("tumb").outputMode("complete").start()
    in.addData(ev(1, 5), ev(2, 20), ev(3, 65), ev(4, 10, typ = "view"))
    drain(q)
    val rows = spark.table("tumb")
      .collect().map(r => (mins(r.getTimestamp(0)), r.getString(2),
        r.getLong(3))).toSet
    assert(rows == Set((0L, "click", 2L), (0L, "view", 1L), (60L, "click", 1L)))
  }

  test("dedupEvents drops duplicate (user_id, event_id) arrivals") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[EvRow]
    val q = EventStream.dedupEvents(in.toDF(), "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    in.addData(ev(1, 0), ev(1, 0), ev(2, 1))
    q.processAllAvailable()
    in.addData(ev(1, 2), ev(3, 3)) // event 1 re-arrives late → dropped
    drain(q)
    assert(spark.table("dedup").select("event_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("statefulSessions closes a session when the gap is exceeded") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[EventStream.Ev]
    val q = EventStream.statefulSessions(in.toDS(), gapMs = 30 * 60000L,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    in.addData(EventStream.Ev(1L, at(0), 10.0), EventStream.Ev(1L, at(5), 2.5))
    q.processAllAvailable()
    // 100 min later: past the 30-min gap → first session must close
    in.addData(EventStream.Ev(1L, at(100), 1.0))
    q.processAllAvailable()
    in.addData(EventStream.Ev(2L, at(300), 1.0)) // advance watermark further
    drain(q)
    val sessions = spark.table("sess")
      .collect().map(r => (r.getLong(0), mins(r.getTimestamp(1)),
        mins(r.getTimestamp(2)), r.getLong(3), r.getDouble(4)))
    assert(sessions.contains((1L, 0L, 5L, 2L, 12.5)))
  }

  test("slidingCounts buckets each event into width/slide overlapping windows") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[EvRow]
    val q = EventStream.slidingCounts(in.toDF(), "1 hour", "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("slid").outputMode("complete").start()
    in.addData(ev(1, 45)) // minute 45: epoch-aligned hour windows at 0 and 30
    drain(q)
    val starts = spark.table("slid")
      .collect().map(r => mins(r.getTimestamp(0))).sorted.toSeq
    assert(starts == Seq(0L, 30L))
  }

  test("writeParquet lands an append stream durably with a checkpoint") {
    implicit val ctx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_sink_stream").toString
    val in = MemoryStream[EvRow]
    val q = EventStream.writeParquet(
      EventStream.dedupEvents(in.toDF(), "1 hour"),
      s"$base/out", s"$base/ckpt")
    in.addData(ev(1, 0), ev(1, 0), ev(2, 1))
    q.processAllAvailable()
    q.stop()
    val landed = spark.read.parquet(s"$base/out")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(landed == Seq(1L, 2L))  // dedup applied before the sink
    assert(new java.io.File(s"$base/ckpt").exists)  // checkpoint written
  }

  test("sessionWindows (native) emits finalized sessions past the watermark") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[EvRow]
    val q = EventStream.sessionWindows(in.toDF(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("swin").outputMode("append").start()
    in.addData(ev(1, 0), ev(2, 5))
    q.processAllAvailable()
    in.addData(ev(3, 200)) // watermark → 190 min, far past session end 35 min
    q.processAllAvailable()
    in.addData(ev(4, 400))
    drain(q)
    val rows = spark.table("swin")
      .collect().map(r => (r.getLong(2), mins(r.getTimestamp(0)),
        mins(r.getTimestamp(1)), r.getLong(3)))
    assert(rows.contains((1L, 0L, 35L, 2L)))
  }

  test("enrichWithDim joins each micro-batch against the static dimension") {
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[EvRow]
    val q = EventStream.enrichWithDim(in.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    in.addData(ev(1, 0, user = 1), ev(2, 1, user = 2), ev(3, 2, user = 99))
    drain(q)
    val rows = spark.table("enrich")
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("tier")).toMap
    // left join: unknown user keeps the event with a null tier
    assert(rows == Map(1L -> "gold", 2L -> "basic", 3L -> null))
  }

  test("transformWithState running spend carries state across micro-batches") {
    implicit val ctx = spark.sqlContext
    val before = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[EventStream.SpendEv]
      val q = EventStream.runningSpend(in.toDS())
        .writeStream.format("memory").queryName("spend").outputMode("append").start()
      in.addData(EventStream.SpendEv(1L, at(0), 10.50),
        EventStream.SpendEv(1L, at(1), 4.25))
      q.processAllAvailable()
      in.addData(EventStream.SpendEv(1L, at(2), 5.25))   // 20.00 total
      q.processAllAvailable()
      // spend then refund in ONE batch: the intra-batch peak (30.00) is
      // the high-water mark even though the end-of-batch total is lower —
      // output must not depend on where micro-batch boundaries fall
      in.addData(EventStream.SpendEv(1L, at(3), 10.00),
        EventStream.SpendEv(1L, at(4), -6.00))
      drain(q)
      val rows = spark.table("spend")
        .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
      // batch 1: 14.75 (new high); batch 2: 20.00 (new high);
      // batch 3: total 24.00, peak 30.00 (new high)
      assert(rows.toSet == Set((14.75, 14.75, true), (20.00, 20.00, true),
        (24.00, 30.00, true)))
    } finally {
      before match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("clickAttribution matches clicks to in-horizon prior views only") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[EvRow]
    val q = EventStream.clickAttribution(in.toDF(), "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    in.addData(
      ev(10, 0, user = 1, typ = "view"),
      ev(11, 10, user = 1, typ = "click"),  // 10 min after view → attributed
      ev(20, 0, user = 2, typ = "view"),
      ev(21, 50, user = 2, typ = "click"),  // 50 min after view → outside horizon
      ev(30, 5, user = 3, typ = "click"))   // no prior view at all
    drain(q)
    val rows = spark.table("attr")
      .collect().map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("view_id")))
    assert(rows.toSet == Set((11L, 10L)))
  }
}
