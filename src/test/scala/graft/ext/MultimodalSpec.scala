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

  test("attachPayload tags modality by id; image rows carry real BMP bytes") {
    val blobs = Multimodal.attachPayload(docs, "doc_id", "text").collect()
    assert(blobs.map(_.media_type).toSeq == Seq("image", "audio", "video"))
    // audio/video stay opaque UTF-8 blobs; the image blob is a BMP file
    assert(new String(blobs(1).payload, "UTF-8") == "audio payload")
    assert(blobs(0).payload(0) == 'B'.toByte && blobs(0).payload(1) == 'M'.toByte)
  }

  test("decodeMeta reads image dimensions from the actual BMP header") {
    val meta = Multimodal.decodeMeta(
      Multimodal.attachPayload(docs, "doc_id", "text")).collect()
    // doc 0: bmpPayload embeds width 1 + 0%64 = 1, height 1 + 0%64 = 1;
    // stride pads one 3-byte pixel row to 4 bytes -> 54 + 4 total bytes
    val img = meta.find(_.doc_id == 0L).get
    assert(img.width == 1 && img.height == 1 && img.byte_len == 58L &&
      img.n_frames == 1)
    val vid = meta.find(_.doc_id == 2L).get
    assert(vid.media_type == "video" && vid.n_frames == 1 + (17 % 30))
  }

  test("decodeBmp parses arbitrary headers, not the id arithmetic") {
    // A hand-built 640x480 BMP under a doc id whose derived dims differ:
    // the decoder must report what the HEADER says.
    val bmp = Multimodal.bmpPayload(7L, "xyz".getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 640).putInt(22, 480)
    val meta = Multimodal.decode(Multimodal.MediaBlob(7L, "image", bmp))
    assert(meta.width == 640 && meta.height == 480)
    // top-down BMPs store negative height; pixel count is the magnitude
    bb.putInt(22, -480)
    assert(Multimodal.decodeBmp(bmp).contains((640, 480)))
    // non-BMP image payloads fall back to the documented stub
    val junk = Multimodal.decode(
      Multimodal.MediaBlob(9L, "image", "not a bitmap".getBytes("UTF-8")))
    assert(junk.width == 64 + 12 % 448)
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
    assert(new String(blobs.find(_.doc_id == 1L).get.payload.take(5), "UTF-8") == "audio")
    // chains into the decode stage without a schema break (the truncated
    // image payload no longer parses as a BMP, so it takes the stub path)
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
