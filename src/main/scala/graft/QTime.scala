/* Isolated single-query timer: `runMain graft.QTime <sfDir> <query>...`
 * times each named SparkEntry query under the Bench session config —
 * for adjudicating bench regressions without a full-suite run (the full
 * suite is itself a variable: 220+ queries of JVM/GC/page-cache history
 * ahead of any given query, and ambient load swings totals 2x; a fresh
 * idle-JVM isolation run answers whether a drifted query reproduces its
 * historical floor — if yes, the drift is suite pressure, not the
 * query's plan). Runs the same data-touching warmup as Bench so pass 1
 * doesn't absorb scan cold-start; SPARK_GRAFT_PASSES (default 4) passes
 * per query, per-pass times and the min printed. */
package graft
import org.apache.spark.sql.SparkSession
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    require(names.nonEmpty, "usage: QTime <sfDir> <query> [query ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "4").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.model.Tables.names.foreach { t =>
      try {
        val df =
          if (t == "events") graft.model.Tables.events(spark, sfDir)
          else graft.model.Tables.load(spark, sfDir, t)
        df.selectExpr("min(xxhash64(struct(*)))").count()
      } catch { case _: Throwable => () }
    }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        // Same cleanup regime as Bench's suite pass: StageCache-pinned
        // shared stages survive (so floors for the q267/q276/q280 trio
        // reflect the same resident-cache steady state the suite runs
        // under — pass 1 cold, later passes warm, min = steady state).
        val pinned = graft.ext.StageCache.pinnedRddIds
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!pinned.contains(id)) rdd.unpersist(blocking = false)
        }
        t
      }
      println(f"TIMED $name%-28s min=${times.min}%.2f passes=${
        times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
