package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-version operators for a training-data pipeline: what changed
  * between two corpus snapshots, and probabilistic new-row detection
  * against a previous run. Extension surface beyond the reference (whose
  * nearest analogue is the new/delisted-key anti joins, SURVEY.md §2.4
  * J5); both operators are what a 100 TB corpus refresh actually runs
  * before deciding how much downstream work to redo.
  */
object Versioning {

  /** Row content hash for change detection: md5 over the value columns
    * (each null-coalesced to a NUL sentinel: `concat_ws` SKIPS nulls,
    * so without it ("x", null) and (null, "x") would hash identically)
    * joined with a  separator (md5 is available and identical in
    * DuckDB, so diffs are oracle-checkable — unlike xxhash64, which the
    * oracle engine lacks). */
  def rowHash(cols: Seq[String]): Column =
    md5(concat_ws("", cols.map(c =>
      coalesce(col(c).cast("string"), lit("\u0000"))): _*))

  /** Snapshot diff by key: one full-outer sort-merge join on the key,
    * emitting only `added` / `removed` / `changed` rows (`unchanged` is
    * implied and usually ~all of a 100 TB corpus — materializing it would
    * be the scale bug). Shuffle volume is two key+hash projections (the
    * value columns collapse to one md5 before the exchange), so the diff
    * moves ~48 bytes/row regardless of document size. */
  def snapshotDiff(prev: DataFrame, next: DataFrame, keyCol: String,
                   valueCols: Seq[String]): DataFrame = {
    val a = prev.select(col(keyCol).as("k"), rowHash(valueCols).as("old_hash"))
    val b = next.select(col(keyCol).as("k"), rowHash(valueCols).as("new_hash"))
    a.join(b, Seq("k"), "full_outer")
      .withColumn("change_type",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed"))
      .filter(col("change_type").isNotNull)
      .select(col("k").as(keyCol), col("change_type"),
        coalesce(col("old_hash"), lit("")).as("old_hash"),
        coalesce(col("new_hash"), lit("")).as("new_hash"))
  }

  /** Exact new-content detection: flag each `next` row whose content hash
    * (md5 over the value columns, [[rowHash]]) does not appear anywhere in
    * `prev`. One distinct over prev's hashes, then a left join marker on
    * the 32-hex-char hash — shuffle volume is key+hash projections
    * regardless of document width, the same fixed-width-key discipline as
    * [[snapshotDiff]]. This is the oracle-checkable ground truth that
    * [[bloomNewDocs]] approximates: run the Bloom pre-pass to cheaply
    * discard the ~99% of a 100 TB refresh that is definitely-seen, then
    * (if exactness is required) run this join only on the survivors. */
  def exactNewDocs(prev: DataFrame, next: DataFrame, keyCol: String,
                   valueCols: Seq[String]): DataFrame = {
    val prevH = prev.select(rowHash(valueCols).as("h")).distinct()
      .withColumn("seen", lit(1))
    next.select(col(keyCol), rowHash(valueCols).as("h"))
      .join(prevH, Seq("h"), "left")
      .select(col(keyCol),
        when(col("seen").isNotNull, 0).otherwise(1).as("is_new"))
  }

  /** Probabilistic new-content detection: build a Bloom filter over the
    * previous snapshot's content hashes (`bloom_filter_agg` — one
    * distributed aggregation collapsing the corpus to a fixed-size bit
    * array), ship the sketch to every probe task as a literal (the
    * `might_contain` expression requires a constant/scalar filter — the
    * one-row sketch IS the aggregation result, a few MB regardless of
    * corpus size, so materializing it is broadcast semantics, not a data
    * collect), and probe each next-snapshot row. `is_new = 1` is DEFINITE
    * new content (Bloom filters have no false negatives); `is_new = 0` is
    * "probably seen" at the configured false-positive rate. This is the
    * cheap pre-pass that lets a corpus refresh skip re-deduplicating the
    * ~99% of a 100 TB snapshot it already processed: one agg + one
    * sketch ship instead of the full-corpus join the exact diff needs.
    * Not oracle-expressible (DuckDB has no matching Bloom implementation)
    * — verified by spec on the no-false-negative guarantee and on being a
    * sound pre-pass for [[exactNewDocs]] (bloom-new ⊆ exact-new). */
  def bloomNewDocs(prev: DataFrame, next: DataFrame, keyCol: String,
                   valueCols: Seq[String],
                   expectedItems: Long = 1000000L,
                   numBits: Long = 8388608L): DataFrame = {
    val fp = xxhash64(concat_ws("", valueCols.map(c =>
      coalesce(col(c).cast("string"), lit("\u0000"))): _*))
    val bf = prev.select(fp.as("h"))
      .agg(expr(s"bloom_filter_agg(h, ${expectedItems}L, ${numBits}L)").as("bf"))
      .head().getAs[Array[Byte]]("bf")
    next.select(col(keyCol),
      when(call_function("might_contain", lit(bf), fp), 0).otherwise(1)
        .as("is_new"))
  }
}
