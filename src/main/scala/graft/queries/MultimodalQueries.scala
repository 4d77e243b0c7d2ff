package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Bpe, Multimodal, Retrieval, Sampling, Similarity, TextAnalysis, TextClean, TextDedup, TextOps}
import graft.model.Tables

/** Oracle-checked wrappers — multimodal tier (typed binary decode
  * plumbing: GIF/WAV stats, frame sampling, multimodal retrieval).
  * Round-12 split of the former `ExtQueries` object — values
  * unchanged. */
object MultimodalQueries {
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeMeta(
        Multimodal.attachPayload(Tables.documents(spark, dir), "doc_id", "text"))
      .toDF()
      .select(col("doc_id"), col("media_type"), col("byte_len"),
        col("width"), col("height"), col("n_frames"),
        col("sample_rate"), col("n_channels"))
      .orderBy("doc_id")

  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
        Multimodal.decodeMeta(
          Multimodal.attachPayload(Tables.documents(spark, dir), "doc_id", "text")),
        stride = 5)
      .orderBy("doc_id", "frame_idx")

  /** GIF pixel statistics (q126): LZW-expand every video payload's
    * frames and aggregate the decoded palette indices — the oracle
    * replays the payload-generation arithmetic (pixels = text bytes
    * & 0x7f, cycled across frames), so the whole container walk + LZW
    * decode is value-checked per document. */
  def gifPixelStats(spark: SparkSession, dir: String): DataFrame =
    Multimodal.gifPixelStats(
        Multimodal.attachPayload(Tables.documents(spark, dir), "doc_id", "text"))
      .withColumn("mean_px", graft.model.Parity.r4(
        col("sum_px").cast("double") / col("n_pixels")))
      .orderBy("doc_id")

  /** WAV audio sample statistics (q127): deinterleave every audio
    * payload's 8-bit PCM stream and aggregate per (doc, channel) — the
    * oracle replays the payload-generation arithmetic (samples = text
    * bytes, zero-padded to channel alignment), so container parse +
    * deinterleave + exact integer aggregation are value-checked end to
    * end. mean/RMS derive from the exact integer sums (no fp
    * accumulation on either side). */
  def wavAudioStats(spark: SparkSession, dir: String): DataFrame =
    Multimodal.wavSampleStats(
        Multimodal.attachPayload(Tables.documents(spark, dir), "doc_id", "text"))
      .withColumn("mean_amp", graft.model.Parity.r4(
        col("sum_amp").cast("double") / col("n_samples")))
      .withColumn("rms", graft.model.Parity.r4(
        sqrt(col("sum_sq").cast("double") / col("n_samples"))))
      .orderBy("doc_id", "channel")

  /** WAV autocorrelation (q128): per-channel lag-{1,2,4,8}
    * autocorrelation over the decoded amplitude sequence, normalized by
    * the exact integer energy R(0) — the classical periodicity feature,
    * integer-exact up to the final rounded ratio. */
  def wavAudioAutocorr(spark: SparkSession, dir: String): DataFrame =
    Multimodal.wavAutocorr(
        Multimodal.attachPayload(Tables.documents(spark, dir), "doc_id", "text"))
      .orderBy("doc_id", "channel")

  /** Decoded features for the multimodal retrieval tier: attach real
    * container payloads, LZW-expand the video rows' pixels, and build
    * the exact integer-ppm pixel histogram — ONE declarative plan from
    * raw documents to a `(doc_id, Array[Long])` feature relation. */
  private def videoFeatures(spark: SparkSession, dir: String,
                            dim: Int): DataFrame =
    Multimodal.gifPixelHistogramPpm(
      Multimodal.attachPayload(Tables.documents(spark, dir), "doc_id", "text"),
      dim)

  /** End-to-end multimodal retrieval, exact tier (q177): decode → pixel
    * histogram feature → brute-force top-k by integer dot product, all
    * one plan (the q162 composition idea applied to multimodal). The
    * probe set (video docs with id < 30) broadcasts by |Q|-bounded
    * contract; scores are exact longs (ppm·ppm ≤ 10¹² per term, dim
    * terms), so ranking has no float drift and ties break on
    * neighbor_id. Scale: candidates never shuffle — the only wide
    * stages are the narrow per-partition decode and the query-keyed
    * top-k window; [[multimodalRetrievalCelled]] is the
    * candidate-restricted scale path. */
  def multimodalRetrieval(spark: SparkSession, dir: String,
                          k: Int = 3, dim: Int = 8): DataFrame = {
    val feats = videoFeatures(spark, dir, dim)
    val queries = feats.filter(col("doc_id") < 30)
      .select(col("doc_id").as("query_id"), col("features_ppm").as("qf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    feats.select(col("doc_id").as("neighbor_id"), col("features_ppm").as("cf"))
      .crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score",
        expr("aggregate(zip_with(qf, cf, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
      .orderBy("query_id", "rank")
  }

  /** Multimodal retrieval, celled tier (q178): IVF-style candidate
    * restriction — every vector's cell is its DOMINANT histogram bucket
    * (first argmax, a deterministic integer), and each query scores only
    * same-cell candidates via an equi join on the cell id. The bucketed
    * analogue of q38/q130: no cross product anywhere, the per-cell
    * candidate lists shuffle once on the cell key, and the oracle
    * recomputes the identical restriction (cells are exact integers, so
    * celled results hash-compare — recall vs the exact tier is specced,
    * not oracled). */
  def multimodalRetrievalCelled(spark: SparkSession, dir: String,
                                k: Int = 3, dim: Int = 8): DataFrame = {
    val cell = expr("CAST(array_position(features_ppm, array_max(features_ppm)) AS INT)")
    val feats = videoFeatures(spark, dir, dim).withColumn("cell", cell)
    val queries = feats.filter(col("doc_id") < 30)
      .select(col("doc_id").as("query_id"), col("features_ppm").as("qf"),
        col("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    feats.select(col("doc_id").as("neighbor_id"), col("features_ppm").as("cf"),
        col("cell"))
      .join(broadcast(queries), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score",
        expr("aggregate(zip_with(qf, cf, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cell"), col("score"),
        col("rank"))
      .orderBy("query_id", "rank")
  }

  /** Multimodal retrieval through the LEARNED-EMBEDDING STAND-IN (q179):
    * decode → pixel-histogram feature → frozen-weight projection
    * ([[graft.ext.Multimodal.projectEmbedding]]) → brute top-k in the
    * EMBEDDED space — the full shape of model-based multimodal
    * retrieval (embed once, score in the low-dimensional space) with a
    * deterministic matrix standing in for trained weights, so the whole
    * chain is value-checked by the oracle rather than trusted. Scores
    * are exact longs (|emb| ≤ 8·10⁶ ⇒ dot ≤ dOut·6.4·10¹³); ties break
    * on neighbor_id. Scale: identical posture to
    * [[multimodalRetrieval]] — the probe set broadcasts, candidates
    * never shuffle, and scoring now touches dOut=4 longs per pair
    * instead of dim=8 (the embedding is the compression). */
  def multimodalEmbedRetrieval(spark: SparkSession, dir: String,
                               k: Int = 3, dIn: Int = 8,
                               dOut: Int = 4): DataFrame = {
    val emb = Multimodal.projectEmbedding(
      videoFeatures(spark, dir, dIn), "features_ppm", dIn, dOut)
    val eCols = (0 until dOut).map(i => s"e$i")
    val queries = emb.filter(col("doc_id") < 30)
      .select(col("doc_id").as("query_id") +:
        eCols.map(c => col(c).as(s"q_$c")): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    emb.select(col("doc_id").as("neighbor_id") +:
        eCols.map(c => col(c).as(s"c_$c")): _*)
      .crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score",
        eCols.map(c => col(s"q_$c") * col(s"c_$c")).reduce(_ + _))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
      .orderBy("query_id", "rank")
  }
}
