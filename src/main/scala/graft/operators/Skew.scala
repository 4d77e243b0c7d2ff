package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys (the 100 TB failure mode AQE's
  * skew-join handling doesn't always reach: aggregations and non-sort-merge
  * joins on power-law keys).
  *
  * Salting is deterministic (hash of the full row, not `rand()`), so
  * results are reproducible and retries/speculative tasks agree. The salt
  * column is internal and dropped before returning.
  */
object Skew {
  private val SaltCol = "__salt"

  /** Equi join where the LEFT side carries skewed keys: the skewed side
    * gets a row-hash salt in [0, salts), the other side is replicated
    * `salts` ways, and the join runs on (keys, salt) — hot keys spread
    * over `salts` tasks instead of one straggler. Result is identical to
    * the unsalted join; cost is `salts`× the small side. */
  def saltedEquiJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                     salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = skewed.withColumn(SaltCol,
      pmod(xxhash64(struct(skewed.columns.map(col): _*)), lit(salts.toLong)))
    val replicated = other
      .withColumn(SaltCol, explode(sequence(lit(0), lit(salts - 1))))
      .withColumn(SaltCol, col(SaltCol).cast("long"))
    salted.join(replicated, keys :+ SaltCol).drop(SaltCol)
  }

  /** Two-phase skew-safe aggregation for decomposable measures
    * (count/sum): partial aggregate on (keys, salt), final merge on keys.
    * Spark's partial (map-side) aggregation usually covers this; the
    * explicit form is for pipelines that must bound per-task state on
    * pathological keys. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn(SaltCol,
        pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts.toLong)))
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum"))
  }

  /** Grouped top-k with bounded per-task state: rank per (group, salt)
    * cell and keep k, then re-rank the ≤ k·salts survivors per group for
    * the true top-k with a dense 1..k `rank` column. Output is IDENTICAL
    * to a single partition-by-group rank window PROVIDED `order` is a
    * total order of the rows (ties would make row_number arbitrary in
    * both forms — add a unique tiebreak column, as every graft query
    * does): a row in the true top-k of its group is a fortiori in the
    * top-k of its own salt cell, so phase 1 never evicts a winner. Use
    * when the group column is low-cardinality relative to the rows being
    * ranked — the case where one group outgrows a window partition. */
  def saltedTopKPerGroup(df: DataFrame, groupCols: Seq[String],
                         order: Seq[Column], k: Int, salts: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(salts > 0, "salts must be positive")
    import org.apache.spark.sql.expressions.Window
    val cell = Window.partitionBy((groupCols :+ SaltCol).map(col): _*)
      .orderBy(order: _*)
    val whole = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn(SaltCol,
        pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts.toLong)))
      .withColumn("__cellrank", row_number().over(cell))
      .filter(col("__cellrank") <= k)
      .withColumn("rank", row_number().over(whole).cast("int"))
      .filter(col("rank") <= k)
      .drop(SaltCol, "__cellrank")
  }
}
