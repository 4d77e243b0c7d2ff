package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: `runMain graft.Explain <sfDir> <query>...`
  * prints the formatted physical plan and wall time for each named query
  * (all queries when none named). The fast feedback loop for the
  * "explain and iterate until it's the plan you'd want" rule.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      println(s"===== $name =====")
      val df = fn(spark, sfDir)
      if (sys.env.get("GRAFT_EXPLAIN_PLAN").forall(_ == "1")) df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$name%s: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
