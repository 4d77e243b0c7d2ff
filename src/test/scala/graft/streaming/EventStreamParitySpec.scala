package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Batch ≡ streaming equivalence for the q120 session-path miner: the
  * `flatMapGroupsWithState` twin must reproduce the batch assignment
  * ([[graft.queries.EventWindows.sessionPathAssignments]]) ROW FOR ROW
  * on the real sf0.001 events corpus — same gap splits, same
  * microsecond session starts, same event counts, same ordered paths.
  * This turns the "bounded state, same semantics" claim into a
  * regression gate instead of a comment.
  */
class EventStreamParitySpec extends SparkSpec {
  import spark.implicits._

  private def usOf(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  test("statefulSessionPaths ≡ batch sessionPathAssignments on sf0.001") {
    implicit val ctx = spark.sqlContext
    // Batch truth. session_start is written timestamp_ntz (the oracle
    // contract); with the session pinned to UTC its wall clock IS the
    // UTC instant, so micros are directly comparable.
    val batch = graft.queries.EventWindows
      .sessionPathAssignments(spark, sf001, gapMinutes = 30)
      .collect()
      .map { r =>
        val ldt = r.getAs[java.time.LocalDateTime]("session_start")
        (r.getAs[Long]("user_id"),
          ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            ldt.getNano / 1000L,
          r.getAs[Int]("n_events"), r.getAs[String]("path"))
      }.toSet

    // Stream the same corpus through the stateful twin, oldest first
    // (a replay), then a far-future sentinel to move the watermark past
    // every open session's timeout.
    val events = graft.model.Tables.events(spark, sf001)
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .as[EventStream.PathEv]
      .collect().sortBy(e => (usOf(e.ts), e.event_id))
    val sentinel = EventStream.PathEv(-1L,
      new java.sql.Timestamp(events.map(_.ts.getTime).max + 86400000L),
      Long.MaxValue, "x")
    val in = MemoryStream[EventStream.PathEv]
    val q = EventStream.statefulSessionPaths(in.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("spar").outputMode("append").start()
    // two chunks + sentinel: state must survive a micro-batch boundary
    val (a, b) = events.splitAt(events.length / 2)
    in.addData(a.toIndexedSeq)
    q.processAllAvailable()
    in.addData(b.toIndexedSeq)
    q.processAllAvailable()
    in.addData(sentinel)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("spar").collect()
      .filter(_.getLong(0) >= 0) // drop the sentinel's own session
      .map(r => (r.getLong(0), usOf(r.getTimestamp(1)), r.getInt(2),
        r.getString(3), r.getBoolean(4)))
    // nothing in this corpus exceeds the 64-type path cap
    assert(got.forall(!_._5), "unexpected truncated session")
    assert(got.length == got.toSet.size, "duplicate session emissions")
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSet == batch,
      s"streaming sessions diverged from the batch assignment " +
        s"(${got.length} streamed vs ${batch.size} batch)")
  }

  test("statefulTransitions ≡ batch eventTransitions matrix on sf0.001") {
    implicit val ctx = spark.sqlContext
    // Batch truth: the q102 (from, to, n) matrix.
    val batch = graft.queries.EventWindows.eventTransitions(spark, sf001)
      .collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"),
        r.getAs[Long]("n")))
      .toSet
    val events = graft.model.Tables.events(spark, sf001)
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .as[EventStream.TransEv]
      .collect().sortBy(e => (usOf(e.ts), e.event_id))
    val in = MemoryStream[EventStream.TransEv]
    // TTL longer than the fixture's event-time span: the batch twin has
    // no state GC, so an exact comparison must not let any user expire
    val q = EventStream.statefulTransitions(in.toDS(),
      idleTtlMs = 365L * 86400 * 1000)
      .writeStream.format("memory").queryName("tpar").outputMode("append").start()
    // three chunks: the one-row per-user state must carry pairs across
    // TWO micro-batch boundaries
    val third = events.length / 3
    Seq(events.take(third), events.slice(third, 2 * third),
        events.drop(2 * third)).foreach { chunk =>
      in.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("tpar").groupBy("from_type", "to_type").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == batch,
      s"streaming transition matrix diverged (${got.size} vs ${batch.size} cells)")
  }
}
