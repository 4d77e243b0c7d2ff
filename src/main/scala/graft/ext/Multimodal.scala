package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media payloads
  * travel as opaque `binary` columns with typed metadata alongside, and
  * decode / feature-extract / frame-sample run as partition-parallel typed
  * `mapPartitions` stages (the Scala analogue of arrow-batched pandas
  * UDFs: one iterator per partition, no per-row serialization round trip).
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked DETERMINISTIC FAKE — it derives metadata from payload
  * bytes with pure arithmetic. The Spark-side contract (schema, binary
  * transport, partition-batched execution, explode-style frame sampling)
  * is real and tested; swapping the stub for libjpeg/ffmpeg changes one
  * function.
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

  /** Decoded (stub) metadata: byte length plus fake modality-specific
    * dimensions. */
  case class MediaMeta(doc_id: Long, media_type: String, byte_len: Long,
                       width: Int, height: Int, n_frames: Int)

  /** Attach a synthetic payload to the documents table: the UTF-8 bytes of
    * the text as the opaque blob, modality tag cycling image/audio/video
    * by doc_id. (In production the payload column arrives from the lake;
    * this builds one deterministically for tests/oracle.) */
  def attachPayload(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaBlob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col(idCol).cast("long").as("doc_id"),
        when(col(idCol) % 3 === 0, "image")
          .when(col(idCol) % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        col(textCol).cast("binary").as("payload"))
      .as[MediaBlob]
  }

  /** STUB DECODER — deterministic fake. A real implementation decodes the
    * payload with an image/audio/video codec; none ship in this container,
    * so metadata is derived from the byte length with fixed arithmetic
    * (making the operator oracle-checkable end-to-end). */
  def decodeStub(b: MediaBlob): MediaMeta = {
    val len = b.payload.length.toLong
    MediaMeta(
      doc_id = b.doc_id,
      media_type = b.media_type,
      byte_len = len,
      width = (64 + len % 448).toInt,
      height = (64 + (len * 7) % 448).toInt,
      n_frames = if (b.media_type == "video") (1 + len % 30).toInt else 1)
  }

  /** Decode a partition of blobs to metadata: typed `mapPartitions`, one
    * batch-shaped iterator per partition (the arrow-UDF execution shape). */
  def decodeMeta(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(decodeStub))
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
}
