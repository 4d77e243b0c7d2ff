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
    // 1 + 2%10 = 3 frames; d = 21 pixels -> LZW stream 21 + 1 + 1 = 23
    // bytes in one sub-block -> byte_len = 398 + 3*(20 + 23 + 1) = 530
    val vid = meta.find(_.doc_id == 2L).get
    assert(vid.media_type == "video" && vid.width == 3 && vid.height == 7 &&
      vid.n_frames == 3 && vid.byte_len == 530L &&
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

  test("gif LZW pixel expansion roundtrips the encoded fill bytes") {
    val fill = "The quick brown fox jumps over 13 lazy dogs!".getBytes("UTF-8")
    // id 5: w=6, h=16, 6 frames, d=96 — multiple clear-code restarts
    val gif = Multimodal.gifPayload(5L, fill)
    val frames = Multimodal.decodeGifPixels(gif).get
    assert(frames.length == 6)
    assert(frames.forall(_.length == 6 * 16))
    val expected = (0 until 6 * 96).map(k => (fill(k % fill.length) & 0x7f).toByte)
    assert(frames.flatten.toSeq == expected)
    // the documented byte-length arithmetic holds for the LZW payload
    val d = 96; val lzw = d + (d + 124) / 125 + 1
    assert(gif.length == 398 + 6 * (20 + lzw + (lzw + 254) / 255))
    // truncation and junk must fail the decode, not misreport pixels
    assert(Multimodal.decodeGifPixels(gif.dropRight(1)).isEmpty)
    assert(Multimodal.decodeGifPixels("not a gif".getBytes("UTF-8")).isEmpty)
    // the metadata walk still reads the same container
    assert(Multimodal.decodeGif(gif).contains((6, 16, 6)))
  }

  test("decodeGifPixels matches the JDK ImageIO encoder (variable-width LZW)") {
    // The JDK's own GIF writer emits REAL growing-dictionary LZW
    // (width bumps at 2^n, KwKwK sequences, no per-125 clears) — an
    // authoritative external encoder our decoder must agree with.
    val w = 40; val h = 30
    val rnd = new scala.util.Random(42)
    val px = Array.fill(w * h)(rnd.nextInt(128))
    val cmap = Array.tabulate(128)(i => (i * 2).toByte)
    val icm = new java.awt.image.IndexColorModel(7, 128, cmap, cmap, cmap)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(y * w + x))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos), "JDK GIF writer missing")
    val gif = bos.toByteArray
    val frames = Multimodal.decodeGifPixels(gif).get
    assert(frames.length == 1 && frames.head.length == w * h)
    // compare COLORS, not raw indices (the writer may permute the
    // palette): decoded index -> this file's own color table -> gray
    // must equal what ImageIO itself reads back per pixel
    val gctOff = 13
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    for (y <- 0 until h; x <- 0 until w) {
      val idx = frames.head(y * w + x) & 0xff
      val gray = gif(gctOff + 3 * idx) & 0xff
      assert(gray == (ref.getRGB(x, y) & 0xff),
        s"pixel ($x,$y): decoded gray $gray vs ImageIO ${ref.getRGB(x, y) & 0xff}")
    }
  }

  test("gifPixelStats aggregates decoded pixels; malformed payloads drop") {
    import spark.implicits._
    val fill = "abcXYZ".getBytes("UTF-8")
    val good = Multimodal.MediaBlob(2L, "video", Multimodal.gifPayload(2L, fill))
    val bad = Multimodal.MediaBlob(5L, "video", "junk".getBytes("UTF-8"))
    val img = Multimodal.MediaBlob(0L, "image", Multimodal.bmpPayload(0L, fill))
    val got = Multimodal.gifPixelStats(Seq(good, bad, img).toDS())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    // id 2: w=3, h=7, 3 frames -> 63 pixels; sum/max from cycled fill
    val pxs = (0 until 63).map(k => fill(k % fill.length) & 0x7f)
    assert(got.toSeq == Seq((2L, 3, 63L, pxs.map(_.toLong).sum, pxs.max)))
  }

  test("gifPixelHistogram buckets decoded palette indices, L1-normalized") {
    import spark.implicits._
    val fill = Array.tabulate(64)(i => (i * 2).toByte) // indices 0..126 even
    val blob = Multimodal.MediaBlob(2L, "video", Multimodal.gifPayload(2L, fill))
    val row = Multimodal.gifPixelHistogram(Seq(blob).toDS(), dim = 4)
      .collect().head
    val feats = row.getAs[scala.collection.Seq[Float]]("features")
    assert(feats.length == 4)
    assert(math.abs(feats.sum - 1.0f) < 1e-5, s"not L1-normalized: $feats")
    // recompute directly from the cycled fill (63 pixels for id 2)
    val counts = new Array[Int](4)
    (0 until 63).foreach(k => counts((fill(k % fill.length) & 0x7f) / 32) += 1)
    assert(feats.toSeq == counts.map(_ / 63f).toSeq)
  }

  test("decodeWavSamples roundtrips PCM bytes; truncation fails the decode") {
    val text = "audio payload" // 13 bytes, doc 1 -> stereo, padded to 14
    val wav = Multimodal.wavPayload(1L, text.getBytes("UTF-8"))
    val (sr, ch, data) = Multimodal.decodeWavSamples(wav).get
    assert(sr == 12000 && ch == 2 && data.length == 14)
    assert(new String(data.take(13), "UTF-8") == text && data(13) == 0)
    // a truncated file must fail the decode (header promises more data)
    assert(Multimodal.decodeWavSamples(wav.dropRight(1)).isEmpty)
    assert(Multimodal.decodeWavSamples("RIFFjunk".getBytes("UTF-8")).isEmpty)
    // 16-bit PCM is out of the canonical 8-bit contract -> None, stub path
    val w16 = wav.clone(); w16(34) = 16
    assert(Multimodal.decodeWavSamples(w16).isEmpty)
  }

  test("wavSampleStats deinterleaves channels and aggregates exactly") {
    import spark.implicits._
    // doc 1 -> stereo; "abcd" + no pad: ch0 = {a,c}, ch1 = {b,d}
    val blob = Multimodal.MediaBlob(1L, "audio",
      Multimodal.wavPayload(1L, "abcd".getBytes("UTF-8")))
    val bad = Multimodal.MediaBlob(4L, "audio", "RIFFjunk".getBytes("UTF-8"))
    val rows = Multimodal.wavSampleStats(Seq(blob, bad).toDS())
      .orderBy("channel").collect()
    assert(rows.length == 2) // malformed payload dropped
    def amps(s: String) = s.map(c => c.toInt - 128)
    val Seq(c0, c1) = Seq(amps("ac"), amps("bd"))
    assert(rows(0).getLong(2) == 2 && rows(0).getLong(3) == c0.sum &&
      rows(0).getLong(4) == c0.map(a => a.toLong * a).sum &&
      rows(0).getInt(5) == c0.map(math.abs).max)
    assert(rows(1).getLong(3) == c1.sum)
    // two distinct samples always cross their mean exactly once (the
    // mean lies strictly between them)
    assert(rows.forall(_.getLong(6) == 1L))
    // a channel that oscillates around its mean counts every strict
    // flip (doc 4 -> ch = 1 + 4%2 = 1, mono)
    val mono = Multimodal.MediaBlob(4L, "audio",
      Multimodal.wavPayload(4L, "azaza".getBytes("UTF-8")))
    val m = Multimodal.wavSampleStats(Seq(mono).toDS()).collect().head
    // amps alternate a(-31) z(-6) strictly around mean -21 -> 4 crossings
    assert(m.getLong(2) == 5 && m.getLong(6) == 4L)
  }

  test("wavAutocorr computes exact lag products normalized by R(0)") {
    import spark.implicits._
    // doc 4 -> mono, sr 8000 + (4%5)*4000 = 24000
    val s = "abcabcabc" // period 3: ac at lag 3 ~ high
    val blob = Multimodal.MediaBlob(4L, "audio",
      Multimodal.wavPayload(4L, s.getBytes("UTF-8")))
    val row = Multimodal.wavAutocorr(Seq(blob).toDS(), lags = Seq(1, 3))
      .collect().head
    val amp = s.map(c => c.toInt - 128)
    val r0 = amp.map(a => a.toLong * a).sum
    def r(l: Int) = (0 until amp.length - l).map(i => amp(i).toLong * amp(i + l)).sum
    assert(row.getLong(2) == 9 && row.getLong(3) == r0)
    def expect(l: Int) = math.round(r(l).toDouble / r0 * 10000) / 10000.0
    assert(math.abs(row.getDouble(4) - expect(1)) < 1e-9)
    assert(math.abs(row.getDouble(5) - expect(3)) < 1e-9)
    // lag 3 aligns the period exactly: every product is a perfect
    // square, so R(3) = 6/9 of R(0) on this 9-sample signal
    assert(row.getLong(3) == 8106L && math.abs(row.getDouble(5) - 0.6667) < 1e-9)
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

  test("gifPixelHistogramPpm is the exact integer form of the float histogram") {
    val fill = "video payload xyz".getBytes("UTF-8")
    val blob = Multimodal.MediaBlob(2L, "video", Multimodal.gifPayload(2L, fill))
    val ppm = Multimodal.gifPixelHistogramPpm(Seq(blob).toDS(), dim = 4)
      .collect().head.getAs[scala.collection.Seq[Long]]("features_ppm")
    // recompute from the cycled fill (63 pixels for id 2)
    val counts = new Array[Long](4)
    (0 until 63).foreach(k => counts((fill(k % fill.length) & 0x7f) / 32) += 1)
    assert(ppm.toSeq == counts.map(_ * 1000000L / 63L).toSeq)
    // entries sum to <= 1e6 (floor division loses at most dim-1 ppm)
    assert(ppm.sum <= 1000000L && ppm.sum > 1000000L - 4)
  }

  test("celled multimodal retrieval: recall vs the exact tier, cells honest") {
    // 60 docs -> 20 video rows; queries are video ids < 30
    val corpus = (0 until 60)
      .map(i => (i.toLong, s"payload text ${"x" * (i % 7)} $i"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("mmret").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val brute = graft.queries.MultimodalQueries.multimodalRetrieval(spark, dir)
    val celled = graft.queries.MultimodalQueries.multimodalRetrievalCelled(spark, dir)
    val b = brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val c = celled.collect()
    // every celled hit is score-consistent with brute's scoring (same
    // feature space): any (q, n) pair in both must carry the same score
    val bScores = brute.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    c.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      bScores.get(key).foreach(s => assert(s == r.getAs[Long]("score")))
    }
    // recall@k of the candidate-restricted tier on this corpus: the
    // dominant-bucket cells are coarse, so demand usefulness, not
    // perfection — at least half the exact top-k pairs survive
    val hits = c.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .count(b.contains)
    assert(hits * 2 >= b.size, s"celled recall too low: $hits of ${b.size}")
    // cells are honest: a returned neighbor shares the query's cell
    val cells = Multimodal.gifPixelHistogramPpm(
        Multimodal.attachPayload(corpus, "doc_id", "text"), 8)
      .withColumn("cell",
        expr("CAST(array_position(features_ppm, array_max(features_ppm)) AS INT)"))
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("cell")).toMap
    c.foreach { r =>
      assert(cells(r.getAs[Long]("query_id")) === r.getAs[Int]("cell"))
      assert(cells(r.getAs[Long]("neighbor_id")) === r.getAs[Int]("cell"))
    }
  }

  test("projectEmbedding: frozen matrix applied exactly, full rank") {
    // the weight matrix rows must not be scalar multiples of each other
    // (the Scaladoc's full-rank claim) — check every row pair
    val w = Array.tabulate(4, 8)((k, j) => Multimodal.embedWeight(k, j))
    for (a <- 0 until 4; b <- (a + 1) until 4) {
      val prop = (0 until 8).forall { j =>
        w(a).zip(w(b)).forall { case (x, y) => x.toLong * w(b)(j) == y.toLong * w(a)(j) }
      }
      assert(!prop, s"rows $a and $b are proportional")
    }
    // unit-vector inputs: projecting e_j (scaled) returns column j of W
    val units = (0 until 8).map { j =>
      (j.toLong, Array.tabulate(8)(i => if (i == j) 1000000L else 0L))
    }.toDF("doc_id", "features_ppm")
    val out = Multimodal.projectEmbedding(units).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getLong).toSeq).toMap
    for (j <- 0 until 8; k <- 0 until 4)
      assert(out(j.toLong)(k) == w(k)(j).toLong * 1000000L,
        s"W($k,$j) mismatch")
  }

  test("embedded retrieval scores equal W-projected dot products") {
    val corpus = (0 until 60)
      .map(i => (i.toLong, s"payload text ${"y" * (i % 5)} $i"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("mmemb").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val feats = Multimodal.gifPixelHistogramPpm(
        Multimodal.attachPayload(corpus, "doc_id", "text"), 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def embed(f: Array[Long]): Array[Long] =
      Array.tabulate(4)(k =>
        (0 until 8).map(j => Multimodal.embedWeight(k, j).toLong * f(j)).sum)
    val got = graft.queries.MultimodalQueries.multimodalEmbedRetrieval(spark, dir)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (q, n) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      val want = embed(feats(q)).zip(embed(feats(n))).map { case (a, b) => a * b }.sum
      assert(r.getAs[Long]("score") == want, s"score mismatch for ($q,$n)")
    }
    // ranks are dense 1..k per query, descending score
    got.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      assert(sorted.map(_.getAs[Long]("score")).toSeq
        == sorted.map(_.getAs[Long]("score")).sortBy(-_).toSeq)
    }
  }

  test("gifAHash: uniform frame hashes to 0; identical content collides") {
    import spark.implicits._
    // doc ids 2 and 98 are both video (id%3==2) with IDENTICAL frame
    // dims (98%32 == 2%32, (98·3)%32 == (2·3)%32), so equal text must
    // produce equal fingerprints through the REAL decode path.
    val text = "perceptual hash fixture with some byte variety 0123"
    val blobs = Seq(
      Multimodal.MediaBlob(2L, "video",
        Multimodal.gifPayload(2L, Array.fill(40)('x'.toByte))),
      Multimodal.MediaBlob(98L, "video",
        Multimodal.gifPayload(98L, text.getBytes("UTF-8"))),
      Multimodal.MediaBlob(194L, "video",
        Multimodal.gifPayload(194L, text.getBytes("UTF-8"))))
    // 194: 194%32=2, (194*3)%32=582%32=6 — same dims again.
    val got = Multimodal.gifAHash(spark.createDataset(blobs))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("ahash"), r.getAs[Int]("n_blocks"))).toMap
    assert(got(2L)._1 == 0L, "uniform pixels must set no bit (strict >)")
    assert(got(98L)._1 == got(194L)._1, "same content, same dims -> same hash")
    assert(got.values.forall(v => v._2 > 0 && v._2 <= 16))
  }

  test("gifAHash matches an independent block-mean recompute from the text") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog 42!"
    val bytes = text.getBytes("UTF-8")
    val id = 11L // 11%3 == 2: video; vw=12, vh=2 (h < grid: empty block rows)
    val got = Multimodal.gifAHash(spark.createDataset(Seq(
        Multimodal.MediaBlob(id, "video", Multimodal.gifPayload(id, bytes)))))
      .collect().head
    // Independent replay of the payload-generation arithmetic (the q126
    // contract): frame-0 pixel gi = bytes(gi % len) & 0x7f, row-major.
    val w = (1 + id % 32).toInt; val h = (1 + id * 3 % 32).toInt
    val sums = new Array[Long](16); val cnts = new Array[Long](16)
    for (gi <- 0 until w * h) {
      val bi = (4 * (gi / w) / h) * 4 + (4 * (gi % w) / w)
      sums(bi) += bytes(gi % bytes.length) & 0x7f
      cnts(bi) += 1
    }
    val tot = sums.sum
    var expect = 0L; var nb = 0
    for (k <- 0 until 16 if cnts(k) > 0) {
      nb += 1
      if (sums(k) * (w * h) > tot * cnts(k)) expect |= 1L << k
    }
    assert(got.getAs[Long]("ahash") == expect)
    assert(got.getAs[Int]("n_blocks") == nb)
  }

  test("q295 near-dup degrees equal the brute-force hamming<=1 census") {
    // The banded join is an optimization, not an approximation at
    // radius 1 (pigeonhole over two 8-bit bands): per-doc near-dup
    // degree and nearest partner must equal the all-pairs census.
    val rows = graft.queries.MultimodalQueries.ahashNearDup(spark, sf001)
      .collect()
    val hashes = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("ahash"))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val brute = hashes.map { case (d, h) =>
      val near = hashes.filter { case (o, oh) => o != d && ham(h, oh) <= 1 }
      d -> (near.length.toLong,
        if (near.isEmpty) -1L else near.map(_._1).min)
    }.toMap
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      assert((r.getAs[Long]("n_near"), r.getAs[Long]("nearest_id"))
        == brute(d), s"doc $d disagrees with brute force")
    }
    // non-vacuous: the sf0.001 corpus does contain at least one near-dup
    assert(rows.exists(_.getAs[Long]("n_near") > 0),
      "fixture has no near-dup pair — census vacuous")
  }

  test("wavEnergyFingerprint: planted duplicate collides; uniform energy" +
      " sets no bit; windows counted honestly") {
    import spark.implicits._
    // ids 2 and 4 are both MONO (ch = 1 + id%2 = 1), so identical PCM
    // content must fingerprint identically through the REAL RIFF parse
    // — the planted-duplicate fixture. (media_type is set directly, so
    // the attachPayload id%3 convention does not apply here.)
    val text = "an audio fingerprint fixture with LOUD!!! and quiet parts"
    val blobs = Seq(
      Multimodal.MediaBlob(2L, "audio",
        Multimodal.wavPayload(2L, text.getBytes("UTF-8"))),
      Multimodal.MediaBlob(4L, "audio",
        Multimodal.wavPayload(4L, text.getBytes("UTF-8"))),
      // constant amplitude: every window's energy equals the mean, the
      // strict > sets no bit
      Multimodal.MediaBlob(6L, "audio",
        Multimodal.wavPayload(6L, Array.fill(64)('x'.toByte))),
      // shorter than 16 samples: fewer live windows, reported honestly
      Multimodal.MediaBlob(8L, "audio",
        Multimodal.wavPayload(8L, "abcde".getBytes("UTF-8"))))
    val got = Multimodal.wavEnergyFingerprint(spark.createDataset(blobs))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("fp"), r.getAs[Int]("n_windows"),
          r.getAs[Long]("n_samples"))).toMap
    assert(got(2L)._1 == got(4L)._1, "identical mono PCM, different hash")
    assert(got(2L)._3 == text.getBytes("UTF-8").length)
    assert(got(6L)._1 == 0L, "uniform energy must set no bit (strict >)")
    assert(got(8L)._2 == 5 && got(8L)._3 == 5,
      s"short clip windows misreported: ${got(8L)}")
    assert(got.values.forall(v => v._2 > 0 && v._2 <= 16))
  }

  test("wavEnergyFingerprint matches an independent window recompute " +
      "from the text (stereo deinterleave)") {
    import spark.implicits._
    val text = "deinterleave me 0101 deinterleave me 9876543210 end."
    val bytes = text.getBytes("UTF-8")
    val idSt = 7L // 7%3 == 1: audio; ch = 1 + 7%2 = 2 -> stereo
    val blobs = Seq(
      Multimodal.MediaBlob(idSt, "audio", Multimodal.wavPayload(idSt, bytes)))
    val got = Multimodal.wavEnergyFingerprint(spark.createDataset(blobs))
      .collect().head
    // independent replay: channel 0 = even data indices; odd text length
    // pads one zero byte (amp -128)
    val ch = (1 + idSt % 2).toInt
    val dlen = bytes.length + (if (bytes.length % ch == 0) 0 else 1)
    val c0 = (0 until dlen by ch).map(i =>
      (if (i < bytes.length) (bytes(i) & 0xff) else 0) - 128)
    val n = c0.length
    val wss = new Array[Long](16); val wn = new Array[Long](16)
    c0.zipWithIndex.foreach { case (a, j) =>
      val wi = (16L * j / n).toInt
      wss(wi) += a.toLong * a; wn(wi) += 1
    }
    val tot = wss.sum
    var expect = 0L; var live = 0
    for (k <- 0 until 16 if wn(k) > 0) {
      live += 1
      if (wss(k) * n > tot * wn(k)) expect |= 1L << k
    }
    assert(got.getAs[Long]("fp") == expect)
    assert(got.getAs[Int]("n_windows") == live)
    assert(got.getAs[Long]("n_samples") == n)
  }

  test("gifTemporalFingerprint: planted duplicate collides; uniform fill " +
      "sets no bit; frame-0 bits equal gifAHash") {
    import spark.implicits._
    // ids 2/98/194 share frame dims AND frame count (98%10 == 8? no —
    // 2%10=2, 98%10=8: different nF). Use 2 and 962: 962%32=2,
    // (962·3)%32=2886%32=6=(2·3)%32, 962%10=2=2%10 — same dims, same
    // frame count, so identical text ⇒ identical signature through the
    // REAL multi-frame decode.
    val text = "temporal fingerprint fixture with varied bytes 98765!"
    val blobs = Seq(
      Multimodal.MediaBlob(2L, "video",
        Multimodal.gifPayload(2L, text.getBytes("UTF-8"))),
      Multimodal.MediaBlob(962L, "video",
        Multimodal.gifPayload(962L, text.getBytes("UTF-8"))),
      Multimodal.MediaBlob(194L, "video",
        Multimodal.gifPayload(194L, Array.fill(40)('x'.toByte))))
    val got = Multimodal.gifTemporalFingerprint(spark.createDataset(blobs))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("vfp"), r.getAs[Int]("n_frames"))).toMap
    assert(got(2L)._1 == got(962L)._1,
      "same content, same geometry -> same signature")
    assert(got(194L)._1 == 0L,
      "uniform pixels must set no spatial or temporal bit (strict >)")
    // frame-0 spatial bits (0..15) must be exactly the q295 aHash
    val ah = Multimodal.gifAHash(spark.createDataset(blobs))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("ahash")).toMap
    got.foreach { case (d, (vfp, _)) =>
      assert((vfp & 0xffffL) == ah(d), s"doc $d frame-0 bits != aHash")
    }
  }

  test("gifTemporalFingerprint matches an independent multi-frame replay " +
      "from the text") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog 42!"
    val bytes = text.getBytes("UTF-8")
    val id = 17L // 17%3 == 2: video; w=18, h=20, nF=8
    val got = Multimodal.gifTemporalFingerprint(spark.createDataset(Seq(
        Multimodal.MediaBlob(id, "video", Multimodal.gifPayload(id, bytes)))))
      .collect().head
    val w = (1 + id % 32).toInt; val h = (1 + id * 3 % 32).toInt
    val nF = (1 + id % 10).toInt; val d = w * h
    // per-frame aHash + pixel sum from the payload arithmetic (pixel
    // k of the concatenated stream = bytes(k % len) & 0x7f)
    val fHash = new Array[Long](nF); val fSum = new Array[Long](nF)
    for (f <- 0 until nF) {
      val sums = new Array[Long](16); val cnts = new Array[Long](16)
      for (j <- 0 until d) {
        val bi = (4 * (j / w) / h) * 4 + (4 * (j % w) / w)
        sums(bi) += bytes((f * d + j) % bytes.length) & 0x7f
        cnts(bi) += 1
      }
      val tot = sums.sum
      for (k <- 0 until 16 if cnts(k) > 0 && sums(k) * d > tot * cnts(k))
        fHash(f) |= 1L << k
      fSum(f) = tot
    }
    val wS = new Array[Long](8); val wP = new Array[Long](8)
    val wC = new Array[Long](8)
    for (f <- 0 until nF) {
      val wi = 8 * f / nF
      wS(wi) += fSum(f); wP(wi) += java.lang.Long.bitCount(fHash(f))
      wC(wi) += 1
    }
    var expect = fHash(0)
    for (k <- 0 until 8 if wC(k) > 0) {
      if (wS(k) * nF > wS.sum * wC(k)) expect |= 1L << (16 + k)
      if (wP(k) * nF > wP.sum * wC(k)) expect |= 1L << (24 + k)
    }
    assert(got.getAs[Long]("vfp") == expect)
    assert(got.getAs[Int]("n_frames") == nF)
  }

  test("q312 near-dup degrees equal the brute-force hamming<=1 census") {
    // Four 8-bit bands are exact at radius 1 (pigeonhole: one flipped
    // bit leaves >= 3 identical bands) — the q295/q306 argument for the
    // 32-bit video signature.
    val rows = graft.queries.MultimodalQueries.videoNearDup(spark, sf001)
      .collect()
    val fps = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("vfp"))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val brute = fps.map { case (d, h) =>
      val near = fps.filter { case (o, oh) => o != d && ham(h, oh) <= 1 }
      d -> (near.length.toLong,
        if (near.isEmpty) -1L else near.map(_._1).min)
    }.toMap
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      assert((r.getAs[Long]("n_near"), r.getAs[Long]("nearest_id"))
        == brute(d), s"doc $d disagrees with brute force")
    }
    assert(rows.nonEmpty, "census must emit one row per video")
  }

  test("q306 near-dup degrees equal the brute-force hamming<=1 census") {
    // Banding over two 8-bit bands is exact at radius 1 (pigeonhole) —
    // same argument as q295, now for the audio tier.
    val rows = graft.queries.MultimodalQueries.audioNearDup(spark, sf001)
      .collect()
    val fps = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("fp"))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val brute = fps.map { case (d, h) =>
      val near = fps.filter { case (o, oh) => o != d && ham(h, oh) <= 1 }
      d -> (near.length.toLong,
        if (near.isEmpty) -1L else near.map(_._1).min)
    }.toMap
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      assert((r.getAs[Long]("n_near"), r.getAs[Long]("nearest_id"))
        == brute(d), s"doc $d disagrees with brute force")
    }
    assert(rows.exists(_.getAs[Long]("n_near") > 0),
      "fixture has no audio near-dup pair — census vacuous")
  }
}
