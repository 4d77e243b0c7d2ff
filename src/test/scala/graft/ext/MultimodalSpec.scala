package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload transport, partition-parallel stub
  * decode, frame sampling, feature extraction shapes.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "image payload bytes"), (1L, "audio payload"), (2L, "video payload xyz")
  ).toDF("doc_id", "text")

  test("attachPayload tags modality by id and carries UTF-8 bytes") {
    val blobs = Multimodal.attachPayload(docs, "doc_id", "text").collect()
    assert(blobs.map(_.media_type).toSeq == Seq("image", "audio", "video"))
    assert(new String(blobs(0).payload, "UTF-8") == "image payload bytes")
  }

  test("decodeMeta derives deterministic metadata per blob") {
    val meta = Multimodal.decodeMeta(
      Multimodal.attachPayload(docs, "doc_id", "text")).collect()
    val img = meta.find(_.doc_id == 0L).get
    assert(img.byte_len == 19L && img.width == 64 + 19 % 448 && img.n_frames == 1)
    val vid = meta.find(_.doc_id == 2L).get
    assert(vid.media_type == "video" && vid.n_frames == 1 + (17 % 30))
  }

  test("sampleFrames strides over video frames only") {
    val meta = Multimodal.decodeMeta(Multimodal.attachPayload(docs, "doc_id", "text"))
    val frames = Multimodal.sampleFrames(meta, stride = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(frames.forall(_._1 == 2L))
    assert(frames.map(_._2).toSeq == (0 until 18 by 5).toSeq)
  }

  test("resizeStub re-shapes payloads in place and chains into decode") {
    val resized = Multimodal.resizeStub(
      Multimodal.attachPayload(docs, "doc_id", "text"), w = 4, h = 3)
    val blobs = resized.collect()
    assert(blobs.forall(_.payload.length == 12))
    assert(blobs.map(_.media_type).sorted.toSeq == Seq("audio", "image", "video"))
    // the resized payload cycles the original bytes
    assert(new String(blobs.find(_.doc_id == 0L).get.payload.take(5), "UTF-8") == "image")
    // chains into the decode stage without a schema break
    val meta = Multimodal.decodeMeta(resized).collect()
    assert(meta.forall(_.byte_len == 12L))
  }

  test("featureStub emits fixed-width float vectors in [0,1]") {
    val feats = Multimodal.featureStub(
        Multimodal.attachPayload(docs, "doc_id", "text"), dim = 8)
      .select(col("features")).as[Seq[Float]].collect()
    assert(feats.forall(f => f.length == 8 && f.forall(x => x >= 0f && x <= 1f)))
  }
}
