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

  test("attachPayload tags modality by id; all rows carry real file bytes") {
    val blobs = Multimodal.attachPayload(docs, "doc_id", "text").collect()
    assert(blobs.map(_.media_type).toSeq == Seq("image", "audio", "video"))
    // image is a BMP file, audio a WAV, video an animated GIF
    assert(blobs(0).payload(0) == 'B'.toByte && blobs(0).payload(1) == 'M'.toByte)
    assert(new String(blobs(1).payload.take(4), "US-ASCII") == "RIFF")
    assert(new String(blobs(2).payload.take(6), "US-ASCII") == "GIF89a")
    // the WAV data chunk carries the text bytes ("audio payload", 13
    // bytes, zero-padded to stereo block align)
    assert(new String(blobs(1).payload.slice(44, 57), "UTF-8") == "audio payload")
  }

  test("decodeMeta reads image and audio metadata from the actual headers") {
    val meta = Multimodal.decodeMeta(
      Multimodal.attachPayload(docs, "doc_id", "text")).collect()
    // doc 0: bmpPayload embeds width 1 + 0%64 = 1, height 1 + 0%64 = 1;
    // stride pads one 3-byte pixel row to 4 bytes -> 54 + 4 total bytes
    val img = meta.find(_.doc_id == 0L).get
    assert(img.width == 1 && img.height == 1 && img.byte_len == 58L &&
      img.n_frames == 1 && img.sample_rate == 0 && img.n_channels == 0)
    // doc 1: wavPayload embeds sr 8000 + (1%5)*4000 = 12000, ch 1+1%2 = 2;
    // "audio payload" (13 bytes) pads to 14 -> 58 total, 7 stereo samples
    val aud = meta.find(_.doc_id == 1L).get
    assert(aud.sample_rate == 12000 && aud.n_channels == 2 &&
      aud.byte_len == 58L && aud.n_frames == 7 &&
      aud.width == 0 && aud.height == 0)
    // doc 2: gifPayload embeds width 1 + 2%32 = 3, height 1 + 6%32 = 7,
    // 1 + 2%10 = 3 frames; d = 21 bytes/frame in one sub-block ->
    // byte_len = 20 + 3*(20 + 21 + 1) = 146
    val vid = meta.find(_.doc_id == 2L).get
    assert(vid.media_type == "video" && vid.width == 3 && vid.height == 7 &&
      vid.n_frames == 3 && vid.byte_len == 146L &&
      vid.sample_rate == 0 && vid.n_channels == 0)
  }

  test("decodeWav parses arbitrary headers, not the id arithmetic") {
    // Re-stamp the header with a rate/layout the id would never derive:
    // the decoder must report what the HEADER says.
    val wav = Multimodal.wavPayload(1L, "abcdef".getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(22, 1.toShort).putInt(24, 44100).putShort(34, 16.toShort)
    // 6 data bytes at 16-bit mono = 3 samples
    assert(Multimodal.decodeWav(wav).contains((44100, 1, 3)))
    // non-WAV audio payloads fall back to the documented stub
    val junk = Multimodal.decode(
      Multimodal.MediaBlob(9L, "audio", "not a riff wave".getBytes("UTF-8")))
    assert(junk.sample_rate == 0 && junk.width == 64 + 15 % 448)
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

  test("decodeGif walks the actual block structure, not the id arithmetic") {
    // Re-stamp the logical screen with dimensions the id would never
    // derive: the decoder must report what the BYTES say.
    val gif = Multimodal.gifPayload(2L, "xyz".getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.wrap(gif).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(6, 320.toShort).putShort(8, 200.toShort)
    assert(Multimodal.decodeGif(gif).contains((320, 200, 3)))
    // the frame count comes from counting image descriptors in the walk:
    // truncating the trailer makes the walk fail, not misreport
    assert(Multimodal.decodeGif(gif.dropRight(1)).isEmpty)
    // a GIF87a magic parses too
    val g87 = gif.clone(); g87(4) = '7'.toByte
    assert(Multimodal.decodeGif(g87).contains((320, 200, 3)))
    // non-GIF video payloads fall back to the documented stub
    val junk = Multimodal.decode(
      Multimodal.MediaBlob(9L, "video", "not a gif at all".getBytes("UTF-8")))
    assert(junk.width == 64 + 16 % 448 && junk.n_frames == 1 + 16 % 30)
  }

  test("sampleFrames strides over video frames only") {
    val meta = Multimodal.decodeMeta(Multimodal.attachPayload(docs, "doc_id", "text"))
    val frames = Multimodal.sampleFrames(meta, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(frames.forall(_._1 == 2L))
    // doc 2's GIF holds 3 frames (decoded from the block walk)
    assert(frames.map(_._2).toSeq == Seq(0, 2))
  }

  test("resizeStub re-shapes payloads in place and chains into decode") {
    val resized = Multimodal.resizeStub(
      Multimodal.attachPayload(docs, "doc_id", "text"), w = 4, h = 3)
    val blobs = resized.collect()
    assert(blobs.forall(_.payload.length == 12))
    assert(blobs.map(_.media_type).sorted.toSeq == Seq("audio", "image", "video"))
    // the resized payload cycles the original (GIF container) bytes
    assert(new String(blobs.find(_.doc_id == 2L).get.payload.take(3), "US-ASCII") == "GIF")
    // chains into the decode stage without a schema break (the truncated
    // payloads no longer parse as BMP/WAV/GIF, so they take the stub path)
    val meta = Multimodal.decodeMeta(resized).collect()
    assert(meta.forall(_.byte_len == 12L))
  }

  test("resize really resamples BMP pixels, stubs the rest") {
    // 2x1 source: left pixel (1,2,3), right pixel (200,201,202) — a 4x2
    // nearest-neighbor upscale must repeat each source pixel twice per
    // row, both rows identical.
    val bb = java.nio.ByteBuffer.allocate(54 + 8) // 2x1, stride 8
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(62).putInt(0).putInt(54)
    bb.putInt(40).putInt(2).putInt(1).putShort(1).putShort(24)
    bb.putInt(0).putInt(8).putInt(2835).putInt(2835).putInt(0).putInt(0)
    bb.put(Array[Byte](1, 2, 3, 200.toByte, 201.toByte, 202.toByte, 0, 0))
    val out = Multimodal.resizeBmp(bb.array(), 4, 2).get
    assert(Multimodal.decodeBmp(out).contains((4, 2)))
    val row0 = out.slice(54, 54 + 12)
    val row1 = out.slice(66, 66 + 12)
    assert(row0.toSeq == Seq[Byte](1, 2, 3, 1, 2, 3,
      200.toByte, 201.toByte, 202.toByte, 200.toByte, 201.toByte, 202.toByte))
    assert(row0.toSeq == row1.toSeq)
    // through the Dataset stage: image rows re-decode at target dims,
    // non-BMP payloads take the documented stub path
    val resized = Multimodal.resize(
      Multimodal.attachPayload(docs, "doc_id", "text"), w = 4, h = 3)
    val meta = Multimodal.decodeMeta(resized).collect()
    val img = meta.find(_.media_type == "image").get
    assert(img.width == 4 && img.height == 3)
    val vid = meta.find(_.media_type == "video").get
    assert(vid.byte_len == 12L) // stub: cycled to w*h bytes
  }

  test("resizeBmp rejects hostile headers instead of reading out of range") {
    // truncated: passes decodeBmp's 26-byte check but has no bpp field
    val tiny = java.nio.ByteBuffer.allocate(26)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tiny.put('B'.toByte).put('M'.toByte)
    tiny.putInt(18, 2).putInt(22, 2)
    assert(Multimodal.resizeBmp(tiny.array(), 2, 2).isEmpty)
    // overflow bait: w=h=60000 makes the Int size product wrap negative
    val evil = Multimodal.bmpPayload(0L, Array[Byte](1))
    val eb = java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    eb.putInt(18, 60000).putInt(22, 60000)
    assert(Multimodal.resizeBmp(evil, 2, 2).isEmpty)
    // negative pixel-data offset
    val neg = Multimodal.bmpPayload(1L, Array[Byte](1))
    java.nio.ByteBuffer.wrap(neg).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(10, -64)
    assert(Multimodal.resizeBmp(neg, 2, 2).isEmpty)
  }

  test("byteHistogram is a real L1-normalized byte distribution") {
    import spark.implicits._
    val blobs = Seq(
      Multimodal.MediaBlob(1L, "video", Array[Byte](0, 0, 0, 127)),
      Multimodal.MediaBlob(2L, "video", Array.empty[Byte])).toDS()
    val feats = Multimodal.byteHistogram(blobs, dim = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // 3 bytes in [0,128) bucket 0, 1 byte (127) also bucket 0 — all 4 low
    assert(feats(1L) == Seq(1.0f, 0.0f))
    assert(feats(2L) == Seq(0.0f, 0.0f))
    val hi = Multimodal.byteHistogram(Seq(
      Multimodal.MediaBlob(3L, "video", Array[Byte](-1, 0))).toDS(), dim = 2)
      .collect().head.getSeq[Float](1)
    assert(hi == Seq(0.5f, 0.5f)) // 0xff lands in the high bucket
    // every histogram sums to ~1 for non-empty payloads
    val real = Multimodal.byteHistogram(
      Multimodal.attachPayload(docs, "doc_id", "text")).collect()
    real.foreach(r => assert(math.abs(r.getSeq[Float](1).sum - 1.0f) < 1e-4))
  }

  test("featureStub emits fixed-width float vectors in [0,1]") {
    val feats = Multimodal.featureStub(
        Multimodal.attachPayload(docs, "doc_id", "text"), dim = 8)
      .select(col("features")).as[Seq[Float]].collect()
    assert(feats.forall(f => f.length == 8 && f.forall(x => x >= 0f && x <= 1f)))
  }
}
