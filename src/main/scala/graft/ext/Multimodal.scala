package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media payloads
  * travel as opaque `binary` columns with typed metadata alongside, and
  * decode / feature-extract / frame-sample run as partition-parallel typed
  * `mapPartitions` stages (the Scala analogue of arrow-batched pandas
  * UDFs: one iterator per partition, no per-row serialization round trip).
  *
  * All THREE modalities are REAL container parses: image rows carry
  * well-formed BMP payloads and [[decodeBmp]] reads width/height from the
  * actual BITMAPINFOHEADER bytes; audio rows carry well-formed PCM WAV
  * payloads and [[decodeWav]] reads sample rate / channels / sample count
  * from the actual RIFF header; video rows carry well-formed animated
  * GIFs and [[decodeGif]] reads width/height from the logical screen
  * descriptor and the frame count by WALKING the block structure
  * (extensions, image descriptors, length-prefixed data sub-blocks) to
  * the trailer — pure integer arithmetic, no codec library needed for
  * any of them. Image RESIZE is also real ([[resizeBmp]]:
  * nearest-neighbor pixel sampling over the uncompressed 24-bit pixel
  * array), and [[byteHistogram]] is a real classical feature extractor
  * (the normalized byte histogram file classifiers predate embeddings
  * with). What remains stubbed is only what needs codec/model libraries
  * this container doesn't ship: GIF LZW pixel expansion, audio/video
  * content transforms, and learned embeddings ([[featureStub]] keeps
  * that batch shape visible). The Spark-side contract (schema, binary
  * transport, partition-batched execution, explode-style frame
  * sampling) is real and tested for all modalities.
  *
  * Scale posture: payloads never hit the driver; decode is a narrow
  * per-partition map (no shuffle); frame sampling is a generator explode
  * whose output is pruned before any join. At 100 TB the only knob is
  * input split size (`spark.sql.files.maxPartitionBytes`) so a partition
  * of blobs fits executor memory.
  */
object Multimodal {

  /** A media row as it travels the pipeline: id + modality tag + opaque
    * payload bytes. */
  case class MediaBlob(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded metadata: byte length plus modality-specific dimensions.
    * Image fills width/height (real, from the BMP header); audio fills
    * sample_rate/n_channels and reports its sample count as n_frames
    * (real, from the WAV header); video fills width/height/n_frames
    * (real, from the GIF screen descriptor + block walk). Fields that
    * don't apply to a modality are 0. */
  case class MediaMeta(doc_id: Long, media_type: String, byte_len: Long,
                       width: Int, height: Int, n_frames: Int,
                       sample_rate: Int, n_channels: Int)

  /** Attach a synthetic payload to the documents table, modality tag
    * cycling image/audio/video by doc_id. Image rows get a WELL-FORMED
    * BMP built by [[bmpPayload]], audio rows a WELL-FORMED PCM WAV built
    * by [[wavPayload]], and video rows a WELL-FORMED animated GIF built
    * by [[gifPayload]] (dimensions/rates/frame counts derived from
    * doc_id, content bytes filled from the text) so all three decode
    * stages exercise a real container parse. (In production the payload
    * column arrives from the lake; this builds one deterministically for
    * tests/oracle.) */
  def attachPayload(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaBlob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("_1"),
        col(textCol).cast("string").as("_2"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        id % 3 match {
          case 0 => MediaBlob(id, "image", bmpPayload(id, bytes))
          case 1 => MediaBlob(id, "audio", wavPayload(id, bytes))
          case _ => MediaBlob(id, "video", gifPayload(id, bytes))
        }
      })
  }

  /** Build a complete 24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER +
    * padded pixel rows) with dimensions derived from the doc id:
    * `width = 1 + id % 64`, `height = 1 + (id·7) % 64`. Rows are padded
    * to 4-byte stride per the format, so `byte_len = 54 + stride·height`
    * — all integer arithmetic the oracle mirrors. Pixel bytes cycle
    * `fill`, so the content is deterministic but non-trivial. */
  def bmpPayload(docId: Long, fill: Array[Byte]): Array[Byte] = {
    val w = (1 + docId % 64).toInt
    val h = (1 + (docId * 7) % 64).toInt
    val stride = ((w * 3 + 3) / 4) * 4
    val dataLen = stride * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataLen)          // file size
    buf.putInt(0)                     // reserved
    buf.putInt(54)                    // pixel data offset
    buf.putInt(40)                    // BITMAPINFOHEADER size
    buf.putInt(w).putInt(h)
    buf.putShort(1)                   // planes
    buf.putShort(24)                  // bits per pixel
    buf.putInt(0)                     // BI_RGB, uncompressed
    buf.putInt(dataLen)               // image size
    buf.putInt(2835).putInt(2835)     // 72 DPI in pixels/metre
    buf.putInt(0).putInt(0)           // palette counts
    var i = 0
    while (i < dataLen) {
      buf.put(if (fill.nonEmpty) fill(i % fill.length) else 0.toByte)
      i += 1
    }
    buf.array()
  }

  /** Build a complete canonical PCM WAV (RIFF + fmt + data chunks, 44-byte
    * header) with format derived from the doc id:
    * `sample_rate = 8000 + (id % 5)·4000`, `channels = 1 + id % 2`, 8-bit
    * samples. Data bytes cycle straight from `fill`, padded by one zero
    * byte when stereo needs an even length, so
    * `byte_len = 44 + len + pad` and `n_samples = (len + pad) / channels`
    * — all integer arithmetic the oracle mirrors. */
  def wavPayload(docId: Long, fill: Array[Byte]): Array[Byte] = {
    val sr = (8000 + (docId % 5) * 4000).toInt
    val ch = (1 + docId % 2).toInt
    val dataLen = fill.length + (if (fill.length % ch == 0) 0 else 1)
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataLen)          // RIFF chunk size
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)                    // fmt chunk size
    buf.putShort(1)                   // PCM
    buf.putShort(ch.toShort)
    buf.putInt(sr)
    buf.putInt(sr * ch)               // byte rate (8-bit samples)
    buf.putShort(ch.toShort)          // block align
    buf.putShort(8)                   // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataLen)
    var i = 0
    while (i < fill.length) { buf.put(fill(i)); i += 1 }
    buf.array()
  }

  /** Build a complete animated GIF89a (header + logical screen descriptor
    * + 2-entry global color table + per-frame graphic-control extension,
    * image descriptor, and length-prefixed data sub-blocks + trailer)
    * with geometry derived from the doc id: `width = 1 + id % 32`,
    * `height = 1 + (id·3) % 32`, `n_frames = 1 + id % 10`. Each frame
    * carries `d = width·height` content bytes cycled from `fill`, split
    * into ≤255-byte sub-blocks, so
    * `byte_len = 20 + n_frames·(20 + d + ceil(d/255))` — all integer
    * arithmetic the oracle mirrors. (The sub-block BYTES are fill
    * content, not valid LZW codes — the container structure is what the
    * block-walking decoder reads; pixel expansion would need a codec.) */
  def gifPayload(docId: Long, fill: Array[Byte]): Array[Byte] = {
    val w = (1 + docId % 32).toInt
    val h = (1 + (docId * 3) % 32).toInt
    val nFrames = (1 + docId % 10).toInt
    val d = w * h
    val nSub = (d + 254) / 255
    val buf = java.nio.ByteBuffer.allocate(20 + nFrames * (20 + d + nSub))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("GIF89a".getBytes("US-ASCII"))
    buf.putShort(w.toShort).putShort(h.toShort) // logical screen
    buf.put(0x80.toByte)                        // GCT present, 2 entries
    buf.put(0.toByte).put(0.toByte)             // bg color, aspect
    buf.put(Array[Byte](0, 0, 0, -1, -1, -1))   // GCT: black, white
    var f = 0
    var k = 0
    while (f < nFrames) {
      buf.put(0x21.toByte).put(0xF9.toByte).put(0x04.toByte) // GCE
      buf.put(0.toByte)                         // flags
      buf.putShort(10)                          // delay (centiseconds)
      buf.put(0.toByte).put(0.toByte)           // transparent idx, term
      buf.put(0x2C.toByte)                      // image descriptor
      buf.putShort(0).putShort(0)               // left, top
      buf.putShort(w.toShort).putShort(h.toShort)
      buf.put(0.toByte)                         // no local color table
      buf.put(7.toByte)                         // LZW min code size
      var rem = d
      while (rem > 0) {
        val n = math.min(255, rem)
        buf.put(n.toByte)
        var j = 0
        while (j < n) {
          buf.put(if (fill.nonEmpty) fill(k % fill.length) else 0.toByte)
          k += 1; j += 1
        }
        rem -= n
      }
      buf.put(0.toByte)                         // block terminator
      f += 1
    }
    buf.put(0x3B.toByte)                        // trailer
    buf.array()
  }

  /** REAL GIF container parse: (width, height, n_frames) from the actual
    * bytes — width/height are the little-endian uint16s of the logical
    * screen descriptor, and the frame count comes from WALKING the block
    * stream (skip the global color table if flagged, skip extension
    * blocks and their data sub-blocks, count image descriptors and skip
    * their local color tables + LZW data sub-blocks) until the trailer.
    * No LZW expansion — frame counting needs only the length-prefixed
    * container structure. Returns None for anything that isn't a
    * plausible GIF (bad magic, truncated walk, zero frames, unknown
    * block type) so callers can fall back. */
  def decodeGif(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    def ascii(off: Int, s: String) =
      s.zipWithIndex.forall { case (c, i) => payload(off + i) == c.toByte }
    try {
      if (payload.length < 14 ||
          !(ascii(0, "GIF87a") || ascii(0, "GIF89a"))) None
      else {
        def u8(i: Int) = payload(i) & 0xff
        def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
        val w = u16(6)
        val h = u16(8)
        val packed = u8(10)
        var pos = 13
        if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 7) + 1))
        def skipSubBlocks(): Unit = {
          var n = u8(pos); pos += 1
          while (n != 0) { pos += n; n = u8(pos); pos += 1 }
        }
        var frames = 0
        var malformed = false
        var done = false
        while (!done && !malformed) {
          u8(pos) match {
            case 0x3B => done = true
            case 0x21 =>            // extension: label byte, then sub-blocks
              pos += 2
              skipSubBlocks()
            case 0x2C =>            // image descriptor
              val ipacked = u8(pos + 9)
              pos += 10
              if ((ipacked & 0x80) != 0) pos += 3 * (1 << ((ipacked & 7) + 1))
              pos += 1              // LZW minimum code size
              skipSubBlocks()
              frames += 1
            case _ => malformed = true
          }
        }
        if (!malformed && frames > 0 && w > 0 && h > 0) Some((w, h, frames))
        else None
      }
    } catch {
      case _: IndexOutOfBoundsException => None // truncated block walk
    }
  }

  /** REAL WAV header parse: (sample_rate, channels, n_samples) from the
    * canonical-layout RIFF/WAVE header — channels at offset 22, sample
    * rate at 24, bits at 34, data length at 40, all little-endian.
    * `n_samples = data_len / block_align`. Returns None for anything that
    * isn't a plausible canonical PCM WAV so callers can fall back. */
  def decodeWav(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    def ascii(off: Int, s: String) =
      s.zipWithIndex.forall { case (c, i) => payload(off + i) == c.toByte }
    if (payload.length >= 44 && ascii(0, "RIFF") && ascii(8, "WAVE") &&
        ascii(12, "fmt ") && ascii(36, "data")) {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val ch = bb.getShort(22).toInt
      val sr = bb.getInt(24)
      val bits = bb.getShort(34).toInt
      val dataLen = bb.getInt(40)
      val blockAlign = ch * bits / 8
      if (ch > 0 && sr > 0 && bits > 0 && dataLen >= 0 && blockAlign > 0)
        Some((sr, ch, dataLen / blockAlign))
      else None
    } else None
  }

  /** REAL BMP header parse: (width, |height|) from the little-endian
    * int32s at offsets 18/22 of a payload opening with the `BM` magic
    * (height is negative for top-down BMPs — the pixel count is the
    * absolute value). Returns None for anything that isn't a plausible
    * BMP so callers can fall back. */
  def decodeBmp(payload: Array[Byte]): Option[(Int, Int)] =
    if (payload.length >= 26 && payload(0) == 'B'.toByte && payload(1) == 'M'.toByte) {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val w = bb.getInt(18)
      val h = bb.getInt(22)
      if (w > 0 && h != 0) Some((w, math.abs(h))) else None
    } else None

  /** STUB DECODER — the malformed-payload fallback, deterministic fake:
    * metadata derived from the byte length with fixed arithmetic (making
    * even the fallback oracle-checkable). Image/audio/video rows never
    * reach this path when their payload is a parseable BMP/WAV/GIF. */
  def decodeStub(b: MediaBlob): MediaMeta = {
    val len = b.payload.length.toLong
    MediaMeta(
      doc_id = b.doc_id,
      media_type = b.media_type,
      byte_len = len,
      width = (64 + len % 448).toInt,
      height = (64 + (len * 7) % 448).toInt,
      n_frames = if (b.media_type == "video") (1 + len % 30).toInt else 1,
      sample_rate = 0,
      n_channels = 0)
  }

  /** Decode one blob: real container parses for image (BMP:
    * width/height), audio (WAV: sample rate / channels / sample count as
    * n_frames), and video (GIF: width/height/frame count) payloads; stub
    * arithmetic only for payloads that fail their format sniff. */
  def decode(b: MediaBlob): MediaMeta = b.media_type match {
    case "image" =>
      decodeBmp(b.payload) match {
        case Some((w, h)) =>
          MediaMeta(b.doc_id, b.media_type, b.payload.length.toLong, w, h, 1,
            0, 0)
        case None => decodeStub(b)
      }
    case "audio" =>
      decodeWav(b.payload) match {
        case Some((sr, ch, n)) =>
          MediaMeta(b.doc_id, b.media_type, b.payload.length.toLong, 0, 0, n,
            sr, ch)
        case None => decodeStub(b)
      }
    case "video" =>
      decodeGif(b.payload) match {
        case Some((w, h, n)) =>
          MediaMeta(b.doc_id, b.media_type, b.payload.length.toLong, w, h, n,
            0, 0)
        case None => decodeStub(b)
      }
    case _ => decodeStub(b)
  }

  /** Decode a partition of blobs to metadata: typed `mapPartitions`, one
    * batch-shaped iterator per partition (the arrow-UDF execution shape). */
  def decodeMeta(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(decode))
  }

  /** Frame sampling for video rows: every `stride`-th frame index of each
    * decoded video — a generator explode; downstream per-frame feature
    * extraction joins nothing and shuffles nothing. */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): DataFrame =
    meta.toDF()
      .filter(col("media_type") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Resize stub: binary → binary at target dimensions (STUB — a real
    * implementation calls an image library per partition; none ship in
    * this container). Deterministic: the output payload is the input
    * cycled to exactly `w·h` bytes. What's real is the stage's shape —
    * payload in, payload out, same transport column, so resize chains
    * between decode and feature-extract with no schema break and no
    * shuffle. */
  def resizeStub(blobs: Dataset[MediaBlob], w: Int, h: Int): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      val out = Array.tabulate(w * h)(i =>
        if (b.payload.length > 0) b.payload(i % b.payload.length) else 0.toByte)
      MediaBlob(b.doc_id, b.media_type, out)
    })
  }

  /** REAL nearest-neighbor resize of a 24-bit uncompressed BMP — pure
    * integer pixel arithmetic (source pixel (x·sw div tw, y·sh div th)
    * per target pixel, rows re-padded to the 4-byte stride), no image
    * library involved. Emits a complete well-formed BMP that
    * [[decodeBmp]] reads back at the target dimensions. Returns None for
    * payloads that aren't plausible 24-bit BMPs so [[resize]] can fall
    * back to the documented stub. */
  def resizeBmp(payload: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
    val dims = decodeBmp(payload)
    if (dims.isEmpty || tw <= 0 || th <= 0 || payload.length < 54) return None
    val (sw, sh) = dims.get
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val bpp = bb.getShort(28).toInt
    val off = bb.getInt(10)
    val srcStride = ((sw * 3 + 3) / 4) * 4
    // size check in LONG arithmetic: a hostile header (w=h=60000, or a
    // negative data offset) overflows the Int product and would slip
    // past the bound into an out-of-range read
    if (bpp != 24 || off < 54 ||
        off.toLong + srcStride.toLong * sh > payload.length) return None
    val dstStride = ((tw * 3 + 3) / 4) * 4
    if (54L + dstStride.toLong * th > Int.MaxValue) return None
    val out = java.nio.ByteBuffer.allocate(54 + dstStride * th)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(54 + dstStride * th).putInt(0).putInt(54)
    out.putInt(40).putInt(tw).putInt(th)
    out.putShort(1).putShort(24)
    out.putInt(0).putInt(dstStride * th)
    out.putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * sh / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * sw / tw).toInt
        val s = off + sy * srcStride + sx * 3
        out.put(payload(s)).put(payload(s + 1)).put(payload(s + 2))
        x += 1
      }
      var pad = dstStride - tw * 3
      while (pad > 0) { out.put(0.toByte); pad -= 1 }
      y += 1
    }
    Some(out.array())
  }

  /** Resize a partition of blobs: REAL nearest-neighbor pixel resize for
    * 24-bit BMP payloads, the documented byte-cycling stub for
    * everything else (audio/video content transforms need codecs). */
  def resize(blobs: Dataset[MediaBlob], w: Int, h: Int): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      resizeBmp(b.payload, w, h) match {
        case Some(out) => MediaBlob(b.doc_id, b.media_type, out)
        case None =>
          val out = Array.tabulate(w * h)(i =>
            if (b.payload.length > 0) b.payload(i % b.payload.length) else 0.toByte)
          MediaBlob(b.doc_id, b.media_type, out)
      }
    })
  }

  /** Feature-extract stub: fixed-width feature vector per blob derived
    * from payload bytes (STUB — stands in for an embedding model). Shows
    * the binary → Array[Float] batch shape. */
  def featureStub(blobs: Dataset[MediaBlob], dim: Int = 8): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map { b =>
      val len = b.payload.length
      val feats = Array.tabulate(dim)(i =>
        (if (len > 0) b.payload(i % len) & 0xff else 0).toFloat / 255f)
      (b.doc_id, feats)
    }).toDF("doc_id", "features")
  }

  /** REAL classical feature extraction: the normalized byte histogram —
    * the content-type/entropy signature file classifiers have used since
    * long before learned embeddings (no model required, so unlike
    * [[featureStub]] this is not a stand-in). `dim` buckets over the
    * 0..255 byte range, L1-normalized; same binary → Array[Float] batch
    * shape as the embedding path, so it feeds the ANN tier unchanged. */
  def byteHistogram(blobs: Dataset[MediaBlob], dim: Int = 32): DataFrame = {
    require(dim > 0 && 256 % dim == 0, s"dim must divide 256, got $dim")
    val spark = blobs.sparkSession
    import spark.implicits._
    val width = 256 / dim
    blobs.mapPartitions(_.map { b =>
      val counts = new Array[Int](dim)
      var i = 0
      while (i < b.payload.length) {
        counts((b.payload(i) & 0xff) / width) += 1
        i += 1
      }
      val n = math.max(b.payload.length, 1).toFloat
      (b.doc_id, counts.map(_ / n))
    }).toDF("doc_id", "features")
  }
}
