package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Distributed exclusive prefix sum — the two-pass scheme that replaces
  * the single unpartitioned window every running-total/packing/Pareto
  * operator naively plans:
  *
  *   1. split the ORDERING key's domain into contiguous ranges with a
  *      pure function of the key (bucketing against driver-computed
  *      approximate quantiles — a function, not a sampled exchange, so
  *      every pass sees the same split; `repartitionByRange` re-samples
  *      per job with a job-dependent seed and would misalign the
  *      passes);
  *   2. pass 1 — per-range value totals (map-side-combined aggregation,
  *      ≤ `ranges` rows), exclusive-scanned on the DRIVER (metadata-
  *      scale: one row per range, never one per input row);
  *   3. pass 2 — within-range exclusive prefix via a window PARTITIONED
  *      by range id, plus the broadcast per-range offset.
  *
  * No task ever holds more than one range, so the plan survives any
  * input size; `ranges` (default: session shuffle parallelism) caps the
  * per-task row count. The result is invariant to WHERE the boundaries
  * fall — any contiguous split yields identical prefix sums (pinned by
  * PackingSpec across range counts on a skewed corpus) — so the
  * quantile approximation affects balance only, never values.
  */
object PrefixSum {

  /** Adds `outCol` = exclusive running sum of `valueCol` (a LONG column;
    * NULL values contribute 0 in both passes)
    * over the order (`keyCol` asc/desc, `ties`...). `keyCol` must be
    * numeric (it is range-bucketed); rows tied on `keyCol` fall in one
    * range and are ordered by `ties` within it, so the full sort key
    * must be unique for a deterministic result — the same contract as a
    * window's ORDER BY. Triggers pass-1 jobs at call time (quantiles +
    * per-range totals). */
  def exclusive(df: DataFrame, keyCol: String, descending: Boolean,
                ties: Seq[Column], valueCol: String, outCol: String,
                ranges: Int = 0): DataFrame =
    exclusiveMulti(df, keyCol, descending, ties, Seq(valueCol -> outCol),
      ranges)

  /** [[exclusive]] for SEVERAL value columns in ONE two-pass run: the
    * quantile scan, per-range totals job and range-keyed window are all
    * shared, so n prefix columns cost the same shuffles as one (the KS
    * drift statistic runs both cohort ECDFs through a single pass).
    * `valueCols` maps each input value column to its output column. */
  def exclusiveMulti(df: DataFrame, keyCol: String, descending: Boolean,
                     ties: Seq[Column], valueCols: Seq[(String, String)],
                     ranges: Int = 0): DataFrame = {
    require(valueCols.nonEmpty, "at least one value column required")
    require(df.schema(keyCol).dataType.isInstanceOf[NumericType],
      s"prefix sum range-buckets on a numeric key; " +
        s"got ${df.schema(keyCol).dataType} for $keyCol")
    val spark = df.sparkSession
    val nRanges = (if (ranges > 0) ranges
      else spark.sessionState.conf.numShufflePartitions).max(1)
    // Three passes read the input (quantiles, totals, final), so stage
    // it once: localCheckpoint materializes the relation and cuts
    // lineage (blocks released by the ContextCleaner on GC, unlike
    // persist) — callers hand us a NARROW projection, so the
    // materialized footprint is (key, value)-sized, not corpus-sized.
    val input = df.localCheckpoint()
    // Pass 0: contiguous key ranges from approximate quantiles — scans
    // only the key column. Duplicate quantiles (skew) leave ranges
    // empty; correctness is boundary-agnostic.
    val bounds =
      if (nRanges == 1) Array.empty[Double]
      else input.stat.approxQuantile(keyCol,
        (1 until nRanges).map(_.toDouble / nRanges).toArray, 0.01)
        .distinct.sorted
    // rng increases along the SORT order: ascending counts boundaries
    // below the key, descending counts boundaries above it. Equal keys
    // always share a range, so `ties` ordering stays within one task.
    val k = col(keyCol).cast("double")
    val bucketed =
      if (bounds.isEmpty) lit(0)
      else aggregate(array(bounds.map(lit(_)): _*), lit(0),
        (acc, b) => acc + (if (descending) when(k < b, 1).otherwise(0)
                           else when(k > b, 1).otherwise(0)))
    // NULL keys: every comparison is null -> bucket 0. Ascending order
    // sorts nulls FIRST (range 0 is right); descending sorts them LAST,
    // so they must land in the final range or the offsets shift every
    // non-null row. NaN is the mirror image (it fails every comparison
    // -> bucket 0, but Spark orders NaN GREATER than everything): last
    // range ascending, first range descending (0 is already right).
    val isFloating = df.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType => true
      case _ => false
    }
    val rng =
      if (descending) when(col(keyCol).isNull, lit(bounds.length))
        .otherwise(bucketed)
      else if (isFloating) when(isnan(col(keyCol)), lit(bounds.length))
        .otherwise(bucketed)
      else bucketed
    val based = input.withColumn("__rng", rng)
    // Pass 1: per-range totals (ALL value columns in one aggregation)
    // → driver-side exclusive scan (≤ nRanges rows cross the wire).
    // NULL values contribute 0 — the same reading the pass-2 window sum
    // gives them (sum skips nulls) — and the per-value coalesce also
    // keeps an all-null range's total at 0L instead of a driver NPE on
    // getLong.
    val totAggs = valueCols.zipWithIndex.map { case ((vc, _), i) =>
      sum(coalesce(col(vc), lit(0L))).as(s"__tot_$i")
    }
    val totals = based.groupBy("__rng")
      .agg(totAggs.head, totAggs.tail: _*)
      .orderBy("__rng").collect()
      .map(r => (r.getInt(0), valueCols.indices.map(i => r.getLong(i + 1))))
    val offsets = totals.map(_._1).zip(
      totals.scanLeft(valueCols.indices.map(_ => 0L)) { case (acc, (_, ts)) =>
        acc.zip(ts).map { case (a, t) => a + t }
      }.init).map { case (rg, offs) => Row.fromSeq(rg +: offs) }
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__rng",
        org.apache.spark.sql.types.IntegerType) +:
        valueCols.indices.map(i => org.apache.spark.sql.types.StructField(
          s"__offset_$i", org.apache.spark.sql.types.LongType)))
    val offsetDf = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq, 1), offSchema))
    // Pass 2: within-range exclusive prefix + broadcast offset, one
    // shared range-keyed window for every value column.
    val ord = (if (descending) col(keyCol).desc else col(keyCol).asc) +: ties
    val w = Window.partitionBy("__rng").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    valueCols.zipWithIndex.foldLeft(based.join(offsetDf, Seq("__rng"))) {
      case (acc, ((vc, oc), i)) =>
        acc.withColumn(oc,
          coalesce(sum(col(vc)).over(w), lit(0L)) + col(s"__offset_$i"))
    }.drop("__rng" +: valueCols.indices.map(i => s"__offset_$i"): _*)
  }
}
