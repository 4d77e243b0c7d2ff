/* Isolated single-query timer: `runMain graft.QTime <query name>...` times
 * each named SparkEntry query twice at sf0.1 under the Bench session
 * config — for adjudicating bench regressions without a 190-query run
 * (ambient machine load swings the full bench 2x; this isolates one
 * query's steady state in seconds instead of minutes). */
package graft
import org.apache.spark.sql.SparkSession
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    args.foreach { name =>
      (1 to 2).foreach { p =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        println(f"TIMED $name pass$p ${(System.nanoTime()-t0)/1e9}%.2f s")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
