package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int) = (1L, (1 to n).map(i => s"w$i").mkString(" "))

  test("short docs become exactly one whole-document chunk") {
    val rows = Chunking.chunk(Seq(doc(10)).toDF("doc_id", "text"),
      "doc_id", "text", chunkTokens = 64, overlap = 16).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(3) == 10L)      // n_tok_chunk
    assert(rows.head.getLong(2) == 0L)       // tok_start
  }

  test("chunks cover every token with the declared overlap") {
    val rows = Chunking.chunk(Seq(doc(150)).toDF("doc_id", "text"),
        "doc_id", "text", chunkTokens = 64, overlap = 16)
      .orderBy("chunk_idx").collect()
    // stride 48: starts at 0, 48, 96 → 3 chunks
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 48L, 96L))
    // consecutive chunks share exactly `overlap` tokens
    val texts = rows.map(_.getString(4).split(" "))
    texts.sliding(2).foreach { case Array(a, b) =>
      assert(a.takeRight(16).sameElements(b.take(16)))
    }
    // full coverage: last chunk reaches the last token
    assert(texts.last.last == "w150")
    // every chunk except possibly the last is full-width
    assert(texts.init.forall(_.length == 64))
  }

  test("invalid overlap is rejected") {
    intercept[IllegalArgumentException] {
      Chunking.chunk(Seq(doc(10)).toDF("doc_id", "text"), "doc_id", "text",
        chunkTokens = 32, overlap = 32)
    }
  }
}
