package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Set-based ingest operators: dedup, relaxed union, upsert, compaction,
  * and mutation-as-rewrite (SURVEY.md §2.8 U1/U2, §2.4 J5/J6, §4.2,
  * §2.1 SNK4/SNK5/SNK7).
  *
  * The reference resolves upserts row-at-a-time against ClickHouse
  * (`/root/reference/src/clickhouse/stock_master.py:144-192`,
  * `/root/reference/scripts/sync_delisted_stocks.py:131-196`) and leans on
  * `ReplacingMergeTree(update_dt)` + `OPTIMIZE FINAL` for last-write-wins
  * (`/root/reference/src/clickhouse/price_client.py:92,275-284`). Here every
  * one of those becomes a single distributed plan:
  *
  *  - dedup/compaction = one hash shuffle on the key + per-partition
  *    row_number (no global sort);
  *  - upsert = union + compaction, so "merge" costs exactly one shuffle
  *    regardless of batch count;
  *  - mutations = columnar rewrite (`when(...)`) that stays in codegen,
  *    because Parquet at 100 TB has no point updates.
  *
  * Determinism note: ClickHouse keeps an *arbitrary* row on version ties;
  * we require a total tie-break order (SURVEY.md §7.3-1) so results are
  * stable across partitionings and match the DuckDB oracle bit-for-bit.
  */
object Ingest {

  /** U2 — key dedup with a deterministic winner
    * (`krx_delisted_crawler.py:314-318`): keep the first row per key under
    * `order` (must be a total order for cross-engine determinism). */
  def dedupByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** U1 — union with relaxed schema alignment (Polars
    * `concat(how="vertical_relaxed")`, `krx_delisted_crawler.py:312`):
    * columns are matched by name, missing columns become nulls. */
  def relaxedUnion(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** J5 — "only new keys" anti-join (replaces the reference's driver-side
    * symbol-set materialization at `daily_stock_master_update.py:264-283`):
    * rows of `incoming` whose key is absent from `existing`. The existing
    * side reduces to distinct keys first, so the probe side is as small as
    * possible; at dimension scale (≤ millions of keys) it broadcasts. */
  def newKeys(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** SNK7 / §4.2 — ReplacingMergeTree compaction: last write wins per key by
    * `versionCol` desc, deterministic tie-break required. Equivalent to
    * `OPTIMIZE TABLE ... FINAL` on `ReplacingMergeTree(update_dt)`. */
  def compactReplacing(df: DataFrame, keys: Seq[String],
                       versionCol: Column, tieBreak: Seq[Column]): DataFrame =
    dedupByKey(df, keys, versionCol.desc +: tieBreak)

  /** J6 set-based upsert — union existing state with an incoming batch and
    * compact: one shuffle replaces the reference's per-row exists-probe loop
    * (`stock_master.py:144-192`). */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             versionCol: Column, tieBreak: Seq[Column]): DataFrame =
    compactReplacing(relaxedUnion(Seq(existing, incoming)), keys, versionCol, tieBreak)

  /** SNK4 — `ALTER TABLE ... UPDATE set WHERE cond`
    * (`stock_master.py:95-111`) as a columnar rewrite: every assignment
    * becomes `when(cond, newValue).otherwise(old)`. */
  def updateWhere(df: DataFrame, cond: Column, assignments: Map[String, Column]): DataFrame =
    assignments.foldLeft(df) { case (d, (c, v)) =>
      d.withColumn(c, when(cond, v).otherwise(col(c)))
    }

  /** SNK5 — predicate delete (`price_client.py:249-273`); like the
    * reference, refuses a trivially-true predicate to avoid wiping the
    * table. The caller overwrites the affected partitions with the result. */
  def deleteWhere(df: DataFrame, cond: Column): DataFrame = {
    require(cond != null, "deleteWhere requires a predicate")
    df.filter(!cond)
  }
}
