package graft.streaming

import graft.SparkSpec
import graft.ext.{TextAnalysis, TextClean}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The per-row text operators (quality, repetition, PII scrub) are pure
  * projections, so they lift onto Structured Streaming unchanged — the
  * same `DataFrame => DataFrame` op runs per micro-batch with no state
  * store and no watermark. This is the streaming half of the corpus
  * intake pipeline: filter/scrub documents as they arrive, before the
  * batch dedup tiers run over the accumulated corpus.
  */
class StreamingTextOpsSpec extends SparkSpec {
  import spark.implicits._

  case class Doc(doc_id: Long, text: String)

  test("piiScrub and repetitionStats run per micro-batch on a stream") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Doc]
    val scrubbed = TextClean.piiScrub(in.toDF(), "doc_id", "text")
    val q = scrubbed.writeStream.format("memory")
      .queryName("scrub").outputMode("append").start()
    in.addData(Doc(1L, "mail a@b.io and call 010-1234-5678 now"))
    q.processAllAvailable()
    in.addData(Doc(2L, "nothing sensitive here"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("scrub").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getString(4)))).toMap
    assert(rows(1L) == ((1L, 1L, "mail <EMAIL> and call <PHONE> now")))
    assert(rows(2L) == ((0L, 0L, "nothing sensitive here")))

    val in2 = MemoryStream[Doc]
    val rep = TextAnalysis.repetitionStats(in2.toDF(), "doc_id", "text")
    val q2 = rep.writeStream.format("memory")
      .queryName("rep").outputMode("append").start()
    in2.addData(Doc(1L, "spam spam spam spam"),
      Doc(2L, "every single word in this longer sentence appears exactly once"))
    q2.processAllAvailable()
    q2.stop()
    val flags = spark.table("rep").collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("is_repetitive")).toMap
    assert(flags == Map(1L -> 1, 2L -> 0))
  }

  test("c4Filter and chunking run per micro-batch on a stream") {
    implicit val ctx = spark.sqlContext
    // The rule cascade is a pure projection, and chunking is a generator
    // projection — both stateless, so they stream unchanged: the arrival
    // path can reject and window documents before anything stateful runs.
    val th = graft.ext.QualityFilters.Thresholds(
      minTokens = 3, meanTokLenLo = 1.0, meanTokLenHi = 10.0,
      longTokLen = 10, maxLongFrac = 0.9, minStopwords = 1)
    val in = MemoryStream[Doc]
    val q = graft.ext.QualityFilters.c4Filter(in.toDF(), "doc_id", "text", th)
      .writeStream.format("memory").queryName("c4s").outputMode("append").start()
    in.addData(Doc(1L, "the cat sat"), Doc(2L, "no"))
    q.processAllAvailable()
    q.stop()
    val keep = spark.table("c4s").collect()
      .map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(keep == Map(1L -> "kept", 2L -> "too_short"))

    val in2 = MemoryStream[Doc]
    val q2 = graft.ext.Chunking.chunk(in2.toDF(), "doc_id", "text",
        chunkTokens = 4, overlap = 1)
      .writeStream.format("memory").queryName("chunks").outputMode("append").start()
    in2.addData(Doc(1L, "a b c d e f g"))
    q2.processAllAvailable()
    q2.stop()
    val chunks = spark.table("chunks").collect()
      .map(r => (r.getLong(1), r.getString(4))).sortBy(_._1)
    assert(chunks.toSeq == Seq((0L, "a b c d"), (1L, "d e f g")))
  }
}
