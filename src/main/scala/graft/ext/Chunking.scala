package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking — the context-window shaping step between a raw
  * corpus and sequence training/embedding: split each document into
  * fixed-size token windows with overlap, keeping provenance (doc id,
  * chunk index, token offset). Extension surface beyond the reference.
  *
  * Scale posture: pure per-row arithmetic — chunk indexes come from
  * `sequence`/`explode` over integer counts and each chunk is a
  * `slice` of the one split-token array, so the operator is a generator
  * projection fused with the scan. Zero shuffles, no state; chunk count
  * per row is `⌈(n-overlap)/stride⌉`, bounded by document length.
  */
object Chunking {
  import TextOps._

  /** Chunk `textCol` into windows of `chunkTokens` tokens advancing by
    * `chunkTokens - overlap` (so consecutive chunks share `overlap`
    * tokens). Integer-exact chunk math (`(n + stride - overlap - 1) div
    * stride`, min 1) — engine-reproducible, no float ceil. Emits
    * (id, chunk_idx, tok_start, n_tok_chunk, chunk_text). */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    val toks = tokens(normText(col(textCol)))
    val n = size(toks)
    // ⌈max(n - overlap, 0) / stride⌉ bounded below by 1 (short docs are
    // one whole-document chunk). floor-of-double-division is exact for
    // any realistic token count (n ≪ 2⁵³).
    val nChunks = greatest(
      floor((n - overlap + (stride - 1)).cast("long") / stride).cast("long"), lit(1L))
    docs.select(col(idCol), toks.as("toks"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * stride).as("tok_start"),
        slice(col("toks"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkTokens)).as("chunk"))
      .select(col(idCol), col("chunk_idx"), col("tok_start"),
        size(col("chunk")).cast("long").as("n_tok_chunk"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
  }
}
