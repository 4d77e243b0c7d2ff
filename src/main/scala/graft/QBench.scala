package graft

import org.apache.spark.sql.SparkSession

/** Developer micro-bench: time a subset of SparkEntry queries without
  * paying for the whole suite. `runMain graft.QBench <sfDir> q33 q35 ...`
  * runs each named query twice (cold then warm) and prints both times —
  * the warm number isolates plan cost from first-touch scan/JIT noise.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries.filter { case (k, _) =>
      names.isEmpty || names.exists(k.startsWith)
    }
    qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val times = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QBENCH $name cold=${times(0)}%.2f warm=${times(1)}%.2f")
      // GRAFT_EXPLAIN=1: dump the final (post-AQE) physical plan.
      if (sys.env.contains("GRAFT_EXPLAIN")) {
        val df = fn(spark, sfDir)
        df.count()
        println(s"=== $name final plan ===")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
