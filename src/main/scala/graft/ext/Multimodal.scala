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
  * any of them. Image RESIZE is real ([[resizeBmp]]: nearest-neighbor
  * pixel sampling over the uncompressed 24-bit pixel array), GIF pixel
  * CONTENT is real ([[decodeGifPixels]]: a complete GIF-flavor LZW
  * decoder — variable code width, clear codes, KwKwK, interlace —
  * cross-validated against the JDK's own ImageIO GIF encoder, feeding
  * [[gifPixelStats]] and [[gifPixelHistogram]]), and [[byteHistogram]]
  * is a real classical feature extractor (the normalized byte histogram
  * file classifiers predate embeddings with), and audio CONTENT is real
  * too ([[wavSampleStats]] / [[wavAutocorr]]: deinterleaved 8-bit PCM
  * amplitude statistics and lag autocorrelation over
  * [[decodeWavSamples]] — uncompressed PCM needs no codec). Learned
  * embeddings ship as an explicit FROZEN-WEIGHT STAND-IN
  * ([[projectEmbedding]]: a fixed integer projection matrix applied to
  * the decoded-content feature vector — the exact execution shape of
  * model inference with the trained weights swapped for a documented
  * deterministic matrix; [[featureStub]] keeps the rawest batch shape
  * visible too). The Spark-side contract (schema,
  * binary transport, partition-batched execution, explode-style frame
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
    * + 128-entry grayscale global color table + per-frame graphic-control
    * extension, image descriptor, and LZW-compressed length-prefixed data
    * sub-blocks + trailer) with geometry derived from the doc id:
    * `width = 1 + id % 32`, `height = 1 + (id·3) % 32`,
    * `n_frames = 1 + id % 10`. Each frame's `d = width·height` PIXELS are
    * 7-bit palette indices cycled from `fill` (`fill(k) & 0x7f`, k global
    * across frames), encoded as a REAL LZW code stream: minimum code size
    * 7, a clear code before every 125 literals so the dictionary never
    * reaches 256 entries and every code stays exactly 8 bits — the
    * classic "uncompressed GIF" encoding, decodable by any conforming
    * LZW decoder (and by [[decodeGifPixels]], which implements the full
    * variable-width algorithm, not just this subset). Byte arithmetic
    * the oracle mirrors: `L = d + ceil(d/125) + 1` LZW bytes per frame,
    * `byte_len = 398 + n_frames·(20 + L + ceil(L/255))` (13 header
    * + 384 color table + 1 trailer + per-frame 8 GCE + 10 descriptor +
    * 1 min-code-size + data sub-blocks + 1 terminator). */
  def gifPayload(docId: Long, fill: Array[Byte]): Array[Byte] = {
    val w = (1 + docId % 32).toInt
    val h = (1 + (docId * 3) % 32).toInt
    val nFrames = (1 + docId % 10).toInt
    val d = w * h
    val lzwLen = d + (d + 124) / 125 + 1
    val nSub = (lzwLen + 254) / 255
    val buf = java.nio.ByteBuffer.allocate(398 + nFrames * (20 + lzwLen + nSub))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("GIF89a".getBytes("US-ASCII"))
    buf.putShort(w.toShort).putShort(h.toShort) // logical screen
    buf.put(0x86.toByte)                        // GCT present, 2^7 entries
    buf.put(0.toByte).put(0.toByte)             // bg color, aspect
    var c = 0
    while (c < 128) {                           // grayscale palette
      val v = (c * 2).toByte
      buf.put(v).put(v).put(v)
      c += 1
    }
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
      // LZW stream: CLEAR(128) every 125 literals, literal pixel codes,
      // EOI(129) — dictionary stays < 256, so codes are exactly one byte
      val codes = new Array[Byte](lzwLen)
      var ci = 0
      var i = 0
      while (i < d) {
        if (i % 125 == 0) { codes(ci) = 0x80.toByte; ci += 1 }
        codes(ci) =
          (if (fill.nonEmpty) fill(k % fill.length) & 0x7f else 0).toByte
        ci += 1; k += 1; i += 1
      }
      codes(ci) = 0x81.toByte                   // end-of-information
      var rem = lzwLen
      var off = 0
      while (rem > 0) {
        val n = math.min(255, rem)
        buf.put(n.toByte)
        buf.put(codes, off, n)
        off += n; rem -= n
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

  /** REAL GIF LZW pixel expansion: every frame's palette-index bytes,
    * decoded from the actual compressed data — a complete GIF-flavor LZW
    * decoder (LSB-first variable-width codes starting at
    * `minCodeSize + 1` bits, dictionary growth with width bumps at each
    * power of two up to 12 bits, clear-code resets, the KwKwK
    * first-use-of-just-added-code case, end-of-information) walked over
    * the same block structure as [[decodeGif]]. Pure byte arithmetic —
    * no codec library. Returns one `Array[Byte]` of `width·height`
    * palette indices per frame (row-major), or None for anything
    * malformed (bad magic, truncated stream, out-of-range code, frame
    * pixel mismatch) so callers can fall back to the documented stub. */
  def decodeGifPixels(payload: Array[Byte]): Option[Seq[Array[Byte]]] = {
    def ascii(off: Int, s: String) =
      s.zipWithIndex.forall { case (c, i) => payload(off + i) == c.toByte }
    try {
      if (payload.length < 14 ||
          !(ascii(0, "GIF87a") || ascii(0, "GIF89a"))) return None
      def u8(i: Int) = payload(i) & 0xff
      def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
      val packed = u8(10)
      var pos = 13
      if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 7) + 1))
      val frames = Seq.newBuilder[Array[Byte]]
      var done = false
      while (!done) {
        u8(pos) match {
          case 0x3B => done = true
          case 0x21 =>
            pos += 2
            var n = u8(pos); pos += 1
            while (n != 0) { pos += n; n = u8(pos); pos += 1 }
          case 0x2C =>
            val fw = u16(pos + 5)
            val fh = u16(pos + 7)
            val ipacked = u8(pos + 9)
            pos += 10
            if ((ipacked & 0x80) != 0) pos += 3 * (1 << ((ipacked & 7) + 1))
            val mcs = u8(pos); pos += 1
            // concatenate the frame's data sub-blocks
            val data = new java.io.ByteArrayOutputStream()
            var n = u8(pos); pos += 1
            while (n != 0) {
              data.write(payload, pos, n)
              pos += n; n = u8(pos); pos += 1
            }
            lzwDecode(data.toByteArray, mcs, fw * fh) match {
              case Some(px) =>
                frames +=
                  (if ((ipacked & 0x40) != 0) deinterlace(px, fw, fh) else px)
              case None => return None
            }
          case _ => return None
        }
      }
      val out = frames.result()
      if (out.nonEmpty) Some(out) else None
    } catch {
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  /** GIF 4-pass interlace: file rows arrive 0,8,16… then 4,12… then
    * 2,6… then 1,3,5… — remap them to top-down row order. */
  private def deinterlace(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](px.length)
    var src = 0
    Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (start, step) =>
      var row = start
      while (row < h) {
        System.arraycopy(px, src * w, out, row * w, w)
        src += 1
        row += step
      }
    }
    out
  }

  /** GIF-flavor LZW over a concatenated code stream: decode exactly
    * `nPixels` palette indices (root codes `0 until 2^minCodeSize`).
    * None on any malformed condition instead of throwing. */
  private[ext] def lzwDecode(data: Array[Byte], minCodeSize: Int,
                             nPixels: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 8 || nPixels < 0) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val MaxDict = 4096
    val prefix = new Array[Int](MaxDict)
    val suffix = new Array[Byte](MaxDict)
    val first = new Array[Byte](MaxDict)   // first byte of the code's string
    val strLen = new Array[Int](MaxDict)
    var i = 0
    while (i < clear) {
      prefix(i) = -1; suffix(i) = i.toByte; first(i) = i.toByte; strLen(i) = 1
      i += 1
    }
    var dictSize = clear + 2
    var width = minCodeSize + 1
    val out = new Array[Byte](nPixels)
    var outPos = 0
    var bitPos = 0
    val nBits = data.length * 8
    def nextCode(): Int =
      if (bitPos + width > nBits) -1
      else {
        var v = 0
        var b = 0
        while (b < width) {           // LSB-first packing
          val p = bitPos + b
          if (((data(p >> 3) >> (p & 7)) & 1) == 1) v |= 1 << b
          b += 1
        }
        bitPos += width
        v
      }
    // write code c's string at outPos (backwards via the prefix chain)
    def emit(c: Int): Boolean = {
      val len = strLen(c)
      if (outPos + len > nPixels) return false
      var p = outPos + len - 1
      var cur = c
      while (cur >= 0) { out(p) = suffix(cur); p -= 1; cur = prefix(cur) }
      outPos += len
      true
    }
    var prev = -1
    var finished = false
    while (!finished && outPos < nPixels) {
      val code = nextCode()
      if (code < 0 || code == eoi) finished = true
      else if (code == clear) {
        dictSize = clear + 2; width = minCodeSize + 1; prev = -1
      } else if (prev == -1) {
        if (code >= clear) return None       // first code after clear: a root
        if (!emit(code)) return None
        prev = code
      } else {
        val known = code < dictSize && code != clear + 0 && code != eoi
        if (!known && code != dictSize) return None
        // new dictionary entry: prev's string + first byte of current's
        val newFirst = if (known) first(code) else first(prev)
        if (dictSize < MaxDict) {
          prefix(dictSize) = prev
          suffix(dictSize) = newFirst
          first(dictSize) = first(prev)
          strLen(dictSize) = strLen(prev) + 1
          dictSize += 1
          if (dictSize == (1 << width) && width < 12) width += 1
        }
        if (!emit(code)) return None
        prev = code
      }
    }
    if (outPos == nPixels) Some(out) else None
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

  /** REAL WAV sample extraction: the canonical-header parse of
    * [[decodeWav]] plus the PCM payload itself — returns
    * `(sample_rate, channels, interleaved unsigned 8-bit samples)`.
    * 8-bit PCM only (the canonical [[wavPayload]] shape; wider sample
    * widths would need the same copy with a stride — deliberately not
    * faked here): anything else returns None so callers fall back to
    * the documented stub. The data slice is bounds-checked against the
    * actual payload length, so a truncated file fails the decode
    * instead of reading garbage. */
  def decodeWavSamples(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
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
      if (ch > 0 && sr > 0 && bits == 8 && dataLen >= 0 &&
          44 + dataLen <= payload.length)
        Some((sr, ch, java.util.Arrays.copyOfRange(payload, 44, 44 + dataLen)))
      else None
    } else None
  }

  /** REAL decoded-sample statistics for the audio modality: deinterleave
    * every WAV payload's 8-bit PCM stream ([[decodeWavSamples]]) and
    * aggregate each channel's amplitudes (`sample − 128`, the unsigned
    * 8-bit midpoint) — count, exact integer sum and sum-of-squares
    * (mean/RMS derive from these without any floating-point
    * accumulation, so the oracle's integers match bit-for-bit), peak
    * |amplitude|, and the strict mean-crossing count: positions where
    * `dev_i = a_i·n − Σa` (the amplitude's exact deviation from the
    * channel mean, scaled by `n` to stay integral) strictly changes
    * sign between consecutive samples. Malformed payloads are dropped
    * (None), keeping the operator a narrow per-partition flatMap — no
    * shuffle, no driver traffic, same scale posture as
    * [[gifPixelStats]]. */
  def wavSampleStats(blobs: Dataset[MediaBlob]): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.filter(_.media_type == "audio").mapPartitions(_.flatMap { b =>
      decodeWavSamples(b.payload).toSeq.flatMap { case (_, ch, data) =>
        (0 until ch).flatMap { c =>
          val n = if (data.length > c) (data.length - c + ch - 1) / ch else 0
          if (n == 0) Nil
          else {
            var sum = 0L
            var ss = 0L
            var peak = 0
            var i = c
            while (i < data.length) {
              val a = (data(i) & 0xff) - 128
              sum += a
              ss += a.toLong * a
              val ab = math.abs(a)
              if (ab > peak) peak = ab
              i += ch
            }
            var cross = 0L
            var prev = 0L
            var started = false
            i = c
            while (i < data.length) {
              val dev = ((data(i) & 0xff) - 128).toLong * n - sum
              if (started &&
                  ((prev > 0 && dev < 0) || (prev < 0 && dev > 0))) cross += 1
              prev = dev
              started = true
              i += ch
            }
            Seq((b.doc_id, c, n.toLong, sum, ss, peak, cross))
          }
        }
      }
    }).toDF("doc_id", "channel", "n_samples", "sum_amp", "sum_sq", "peak",
      "n_crossings")
  }

  /** Per-channel autocorrelation at the given lags — the classical
    * pitch/periodicity feature, computed on exact integers:
    * `R(L) = Σ a_i·a_{i+L}` over the channel's amplitude sequence, with
    * `R(0)` as the normalizer (always > 0 for a non-empty channel).
    * Emitted normalized (`ac<L> = round(R(L)/R(0), 4)`) alongside the
    * raw `r0`, so the oracle checks both the exact integer energy and
    * the rounded ratios. Same narrow no-shuffle decode shape as
    * [[wavSampleStats]]. */
  def wavAutocorr(blobs: Dataset[MediaBlob],
                  lags: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ > 0), s"lags must be positive: $lags")
    val spark = blobs.sparkSession
    import spark.implicits._
    val lagList = lags.toList
    val raw = blobs.filter(_.media_type == "audio").mapPartitions(_.flatMap { b =>
      decodeWavSamples(b.payload).toSeq.flatMap { case (_, ch, data) =>
        (0 until ch).flatMap { c =>
          val n = if (data.length > c) (data.length - c + ch - 1) / ch else 0
          if (n == 0) Nil
          else {
            val amp = new Array[Int](n)
            var i = c
            var j = 0
            while (i < data.length) {
              amp(j) = (data(i) & 0xff) - 128
              j += 1
              i += ch
            }
            var r0 = 0L
            var k = 0
            while (k < n) { r0 += amp(k).toLong * amp(k); k += 1 }
            val rs = lagList.map { l =>
              var s = 0L
              var p = 0
              while (p + l < n) { s += amp(p).toLong * amp(p + l); p += 1 }
              s
            }
            Seq((b.doc_id, c, n.toLong, r0, rs))
          }
        }
      }
    }).toDF("doc_id", "channel", "n_samples", "r0", "rs")
    raw.select(
      col("doc_id") +: col("channel") +: col("n_samples") +: col("r0") +:
        lagList.zipWithIndex.map { case (l, i) =>
          graft.model.Parity.r4(col("rs")(i).cast("double") / col("r0"))
            .as(s"ac$l")
        }: _*)
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
    * everything else ("resize" has no audio meaning; GIF re-encode
    * would need an LZW encoder — decode-side content features for both
    * are real: [[wavSampleStats]], [[gifPixelStats]]). */
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

  /** The frozen "model weight" W(k,j) of the learned-embedding
    * stand-in: ((37k + 11j + 5) mod 17) − 8 — an integer in [−8, 8],
    * zero-centered, chosen so no two output rows are scalar multiples
    * (the projection has full rank over the 8-bucket input). A real
    * model swaps this closed form for a broadcast weight lookup;
    * nothing else in [[projectEmbedding]] changes. */
  def embedWeight(k: Int, j: Int): Int = ((37 * k + 11 * j + 5) % 17) - 8

  /** LEARNED-EMBEDDING STAND-IN — closes the one gap in this tier. Real
    * multimodal embedding inference is: broadcast the trained weights,
    * run a batched linear(+nonlinear) projection over each partition's
    * decoded feature vectors, emit a fixed-width dense vector per row.
    * This operator has exactly that execution shape with the trained
    * matrix replaced by the deterministic [[embedWeight]] matrix:
    *
    *   emb_k = Σ_j W(k,j) · fv[j]   (exact integer arithmetic)
    *
    * applied to the exact integer-ppm feature vector (so |emb_k| ≤
    * 8·10⁶ for an L1-normalized ppm input and downstream dot-product
    * scores stay exact longs). The projection is pure Column
    * arithmetic — codegen'd by Tungsten, no UDF, no shuffle — and the
    * oracle recomputes the identical integers, so unlike a real model
    * the stand-in is value-checked end to end. Swapping in real
    * weights = replacing the literal matrix with a broadcast array;
    * the plan shape, schema, and scale posture are unchanged. */
  def projectEmbedding(feats: DataFrame, featCol: String = "features_ppm",
                       dIn: Int = 8, dOut: Int = 4): DataFrame = {
    require(dIn > 0 && dOut > 0, s"bad embedding dims: $dIn -> $dOut")
    val embCols = (0 until dOut).map { k =>
      (0 until dIn).map(j => col(featCol)(j) * lit(embedWeight(k, j).toLong))
        .reduce(_ + _).as(s"e$k")
    }
    feats.select(col("doc_id") +: embCols: _*)
  }

  /** REAL decoded-pixel statistics for the video modality: LZW-expand
    * every GIF frame ([[decodeGifPixels]]) and aggregate the palette
    * indices — frame count, total pixels, exact integer pixel sum and
    * max. The q126 oracle recomputes the identical integers from the
    * payload-generation arithmetic, so the full container parse + LZW
    * decode roundtrip is value-checked, not just length-checked.
    * Malformed payloads are dropped (None), keeping the operator a
    * narrow per-partition flatMap — no shuffle, no driver traffic. */
  def gifPixelStats(blobs: Dataset[MediaBlob]): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.filter(_.media_type == "video").mapPartitions(_.flatMap { b =>
      decodeGifPixels(b.payload).map { frames =>
        var sum = 0L
        var max = 0
        var n = 0L
        frames.foreach { f =>
          n += f.length
          var i = 0
          while (i < f.length) {
            val v = f(i) & 0xff
            sum += v
            if (v > max) max = v
            i += 1
          }
        }
        (b.doc_id, frames.length, n, sum, max)
      }
    }).toDF("doc_id", "n_frames", "n_pixels", "sum_px", "max_px")
  }

  /** Perceptual AVERAGE-HASH (aHash) of the first decoded frame — the
    * classic content-addressable image fingerprint (block-mean
    * thresholding, the simplest of the pHash family): LZW-expand the
    * GIF ([[decodeGifPixels]]), block-average frame 0 into a
    * `grid`×`grid` mosaic, and set bit (by·grid+bx) when that block's
    * mean EXCEEDS the frame mean. Two images whose fingerprints differ
    * in ≤1 bit are near-duplicates under brightness-preserving edits —
    * the image-dedup tier next to the text tiers (MinHash/SimHash).
    *
    * Exactness: the threshold is the integer cross-multiply
    * `block_sum·n_px > frame_sum·block_n` — no division, no floats —
    * so the hash is bit-reproducible and the oracle recomputes it from
    * the payload-generation arithmetic, value-checking the REAL
    * container walk + LZW decode underneath. Blocks can be empty when
    * the frame is narrower than the grid (w or h < grid); empty blocks
    * contribute no bit and `n_blocks` reports the live count.
    *
    * Scale: per-partition flatMap (decode is row-local, no shuffle);
    * the 16-bit fingerprint is 8 bytes per image — the downstream
    * banded self-join (see the q295 wrapper) is the SimHash
    * prefix-table shape, never all-pairs. */
  def gifAHash(blobs: Dataset[MediaBlob], grid: Int = 4): DataFrame = {
    require(grid >= 2 && grid * grid <= 63, s"grid out of [2,7]: $grid")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.filter(_.media_type == "video").mapPartitions(_.flatMap { b =>
      for {
        (w, h, _) <- decodeGif(b.payload)
        frames <- decodeGifPixels(b.payload)
        f0 <- frames.headOption
      } yield {
        val n = w * h
        val gSum = new Array[Long](grid * grid)
        val gCnt = new Array[Long](grid * grid)
        var idx = 0
        while (idx < n) {
          val bi = (grid * (idx / w) / h) * grid + (grid * (idx % w) / w)
          gSum(bi) += (f0(idx) & 0xff)
          gCnt(bi) += 1
          idx += 1
        }
        var tot = 0L
        var k = 0
        while (k < grid * grid) { tot += gSum(k); k += 1 }
        var hash = 0L
        var nb = 0
        k = 0
        while (k < grid * grid) {
          if (gCnt(k) > 0) {
            nb += 1
            if (gSum(k) * n > tot * gCnt(k)) hash |= (1L << k)
          }
          k += 1
        }
        (b.doc_id, hash, nb)
      }
    }).toDF("doc_id", "ahash", "n_blocks")
  }

  /** AUDIO ENERGY FINGERPRINT of the channel-0 PCM stream — the
    * audio-dedup tier beside the image aHash ([[gifAHash]]) and the
    * text tiers: the block-energy thresholding scheme of the
    * Haitsma–Kalker fingerprint family reduced to its deterministic
    * integer core. Decode the WAV ([[decodeWavSamples]]), split channel
    * 0 into `windows` contiguous temporal windows (the same integer
    * split as the aHash mosaic: window ⌊windows·j/n⌋ for sample j of
    * n), and set bit w when that window's ENERGY (Σ amplitude²) exceeds
    * the per-window mean — the exact integer cross-multiply
    * `win_ss·n > tot_ss·win_n`, no division, no floats, so the
    * fingerprint is bit-reproducible and near-identical audio (small
    * edits that preserve the energy envelope) lands within a bit or
    * two. Windows can be empty when n < windows; empty windows
    * contribute no bit and `n_windows` reports the live count.
    *
    * Scale: per-partition flatMap (decode is row-local, no shuffle);
    * the 16-bit fingerprint is 8 bytes per clip — the downstream banded
    * self-join (the q306 wrapper) is exactly the q295 image-dedup
    * plan: two 8-bit bands, pigeonholed candidates ~N²/256 per band,
    * `bit_count(xor)` verification on the sliver only, never
    * all-pairs. */
  def wavEnergyFingerprint(blobs: Dataset[MediaBlob],
                           windows: Int = 16): DataFrame = {
    require(windows >= 2 && windows <= 63, s"windows out of [2,63]: $windows")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.filter(_.media_type == "audio").mapPartitions(_.flatMap { b =>
      decodeWavSamples(b.payload).flatMap { case (_, ch, data) =>
        val n = (data.length + ch - 1) / ch // channel-0 sample count
        if (n == 0) None
        else {
          val wSS = new Array[Long](windows)
          val wN = new Array[Long](windows)
          var j = 0
          var i = 0
          while (i < data.length) {
            val a = (data(i) & 0xff) - 128
            val wi = (windows.toLong * j / n).toInt
            wSS(wi) += a.toLong * a
            wN(wi) += 1
            j += 1
            i += ch
          }
          var tot = 0L
          var k = 0
          while (k < windows) { tot += wSS(k); k += 1 }
          var hash = 0L
          var nw = 0
          k = 0
          while (k < windows) {
            if (wN(k) > 0) {
              nw += 1
              if (wSS(k) * n > tot * wN(k)) hash |= (1L << k)
            }
            k += 1
          }
          Some((b.doc_id, hash, nw, n.toLong))
        }
      }
    }).toDF("doc_id", "fp", "n_windows", "n_samples")
  }

  /** VIDEO TEMPORAL FINGERPRINT — the fourth-modality dedup signature
    * ([[gifAHash]] is spatial-only, frame 0): LZW-expand EVERY frame,
    * compute the per-frame aHash sequence, and fold frames into one
    * 32-bit spatio-temporal signature:
    *
    *   - bits 0..grid²−1: frame 0's aHash (the q295 arithmetic
    *     verbatim — same block mosaic, same integer cross-multiply);
    *   - bits grid²..grid²+windows−1: the BRIGHTNESS envelope — split
    *     the frame axis into `windows` temporal windows (window
    *     ⌊windows·f/nF⌋, the q306 audio split applied to frames) and
    *     set the bit when the window's total pixel sum exceeds the
    *     per-window mean (`win_sum·nF > tot_sum·win_frames`, exact
    *     integer cross-multiply);
    *   - bits grid²+windows..grid²+2·windows−1: the aHash POPCOUNT
    *     envelope — the same temporal thresholding on the per-frame
    *     aHash bit counts, so the signature reacts to WHEN the spatial
    *     structure changes, not just how bright frames are.
    *
    * Near-identical videos (re-encodes, small edits preserving the
    * brightness/structure envelope) land within a bit or two; the
    * downstream banded self-join (the q312 wrapper) splits the 32 bits
    * into four 8-bit bands — hamming ≤ 1 guarantees ≥ 3 identical
    * bands (pigeonhole), candidates ~N²/256 per band, never all-pairs.
    *
    * Exactness: every threshold is an integer cross-multiply — no
    * division, no floats — so the signature is bit-reproducible and
    * the oracle recomputes it from the payload-generation arithmetic,
    * value-checking the REAL container walk + full LZW decode of every
    * frame underneath. Scale: per-partition flatMap, no shuffle; 8
    * bytes per video. */
  def gifTemporalFingerprint(blobs: Dataset[MediaBlob], grid: Int = 4,
                             windows: Int = 8): DataFrame = {
    require(grid >= 2 && windows >= 2 && grid * grid + 2 * windows <= 63,
      s"signature must fit a long: grid=$grid windows=$windows")
    val spark = blobs.sparkSession
    import spark.implicits._
    val g2 = grid * grid
    blobs.filter(_.media_type == "video").mapPartitions(_.flatMap { b =>
      for {
        wh <- decodeGif(b.payload)
        frames <- decodeGifPixels(b.payload)
        if frames.nonEmpty
      } yield {
        val (w, h, _) = wh
        val d = w * h
        val nF = frames.length
        val fHash = new Array[Long](nF)
        val fSum = new Array[Long](nF)
        var f = 0
        while (f < nF) {
          val fr = frames(f)
          val gSum = new Array[Long](g2)
          val gCnt = new Array[Long](g2)
          var idx = 0
          while (idx < d) {
            val bi = (grid * (idx / w) / h) * grid + (grid * (idx % w) / w)
            gSum(bi) += (fr(idx) & 0xff)
            gCnt(bi) += 1
            idx += 1
          }
          var tot = 0L
          var k = 0
          while (k < g2) { tot += gSum(k); k += 1 }
          var hash = 0L
          k = 0
          while (k < g2) {
            if (gCnt(k) > 0 && gSum(k) * d > tot * gCnt(k))
              hash |= (1L << k)
            k += 1
          }
          fHash(f) = hash
          fSum(f) = tot
          f += 1
        }
        val wS = new Array[Long](windows)
        val wP = new Array[Long](windows)
        val wC = new Array[Long](windows)
        var totS = 0L
        var totP = 0L
        f = 0
        while (f < nF) {
          val wi = (windows.toLong * f / nF).toInt
          val p = java.lang.Long.bitCount(fHash(f)).toLong
          wS(wi) += fSum(f); wP(wi) += p; wC(wi) += 1
          totS += fSum(f); totP += p
          f += 1
        }
        var vfp = fHash(0)
        var k = 0
        while (k < windows) {
          if (wC(k) > 0) {
            if (wS(k) * nF > totS * wC(k)) vfp |= (1L << (g2 + k))
            if (wP(k) * nF > totP * wC(k)) vfp |= (1L << (g2 + windows + k))
          }
          k += 1
        }
        (b.doc_id, vfp, nF)
      }
    }).toDF("doc_id", "vfp", "n_frames")
  }

  /** Decoded-PIXEL histogram for video rows: the [[byteHistogram]]
    * treatment applied to the LZW-expanded palette indices (0..127)
    * instead of the raw container bytes — a real content feature for
    * the third modality, same `doc_id → Array[Float]` shape, so it
    * feeds the ANN tier unchanged. Malformed payloads are dropped. */
  def gifPixelHistogram(blobs: Dataset[MediaBlob], dim: Int = 32): DataFrame = {
    require(dim > 0 && 128 % dim == 0, s"dim must divide 128, got $dim")
    val spark = blobs.sparkSession
    import spark.implicits._
    val width = 128 / dim
    blobs.filter(_.media_type == "video").mapPartitions(_.flatMap { b =>
      decodeGifPixels(b.payload).map { frames =>
        val counts = new Array[Int](dim)
        var n = 0L
        frames.foreach { f =>
          var i = 0
          while (i < f.length) {
            counts(((f(i) & 0xff) % 128) / width) += 1
            i += 1
          }
          n += f.length
        }
        (b.doc_id, counts.map(_ / math.max(n, 1L).toFloat))
      }
    }).toDF("doc_id", "features")
  }

  /** [[gifPixelHistogram]] in EXACT integer parts-per-million: bucket
    * counts over the LZW-expanded palette indices, each scaled
    * `count·10⁶ div n_pixels` — an L1-normalized feature vector whose
    * every entry is a long, so downstream dot-product scoring stays in
    * exact integer arithmetic end-to-end (engine-reproducible: the
    * oracle rebuilds the same vector from the payload-generation
    * arithmetic). Same narrow per-partition decode shape; malformed
    * payloads are dropped. */
  def gifPixelHistogramPpm(blobs: Dataset[MediaBlob], dim: Int = 8): DataFrame = {
    require(dim > 0 && 128 % dim == 0, s"dim must divide 128, got $dim")
    val spark = blobs.sparkSession
    import spark.implicits._
    val width = 128 / dim
    blobs.filter(_.media_type == "video").mapPartitions(_.flatMap { b =>
      decodeGifPixels(b.payload).map { frames =>
        val counts = new Array[Long](dim)
        var n = 0L
        frames.foreach { f =>
          var i = 0
          while (i < f.length) {
            counts(((f(i) & 0xff) % 128) / width) += 1
            i += 1
          }
          n += f.length
        }
        val den = math.max(n, 1L)
        (b.doc_id, counts.map(c => c * 1000000L / den))
      }
    }).toDF("doc_id", "features_ppm")
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
