package graft.streaming

import graft.SparkSpec
import graft.ext.TextDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming corpus dedup: the firehose shape a training-data pipeline
  * runs — each micro-batch probes the persisted exact-dedup state via
  * `foreachBatch` + [[TextDedup.exactGroupsIncremental]], keeps only
  * new-unique documents, and extends the state for the next batch. No
  * new operator code: this pins the WIRING (incremental dedup composes
  * with Structured Streaming's batch hook, state survives across
  * micro-batches).
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  case class Doc(doc_id: Long, text: String)

  test("foreachBatch + incremental exact state keeps first-seen texts only") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Doc]
    val seed = Seq((0L, "the original seed document text")).toDF("doc_id", "text")
    var state = TextDedup.exactState(seed, "doc_id", "text").localCheckpoint()
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]

    val q = in.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val (asg, next) = TextDedup.exactGroupsIncremental(state, batch,
          "doc_id", "text")
        kept ++= asg.filter(org.apache.spark.sql.functions.col("is_new_group") === 1)
          .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
          .collect()
        state = next.localCheckpoint()
      }
      .start()

    in.addData(Doc(1L, "the original seed document text"),   // dup of seed → dropped
      Doc(2L, "fresh text a"))
    q.processAllAvailable()
    in.addData(Doc(3L, "fresh text a"),                      // dup from batch 1 → dropped
      Doc(4L, "fresh text b"))
    q.processAllAvailable()
    q.stop()

    assert(kept.sorted.toSeq == Seq(2L, 4L))
    // state now resolves everything seen so far
    val (asg, _) = TextDedup.exactGroupsIncremental(state,
      Seq((9L, "fresh text b")).toDF("doc_id", "text"), "doc_id", "text")
    assert(asg.collect()(0).getLong(1) == 4L)
  }
}
