package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located join evidence: two tables bucketed+sorted on the join key
  * must sort-merge-join with ZERO shuffle exchange — the layout that
  * eliminates the fact⋈fact shuffle at 100 TB.
  */
class BucketedJoinSpec extends SparkSpec {

  test("same-bucketed tables join with no shuffle exchange") {
    val orders = graft.model.Tables.orders(spark, sf001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = graft.model.Tables.customer(spark, sf001)
      .select("c_custkey", "c_mktsegment")
    Sinks.writeBucketed(orders, "orders_bucketed", 4, Seq("o_custkey"))
    Sinks.writeBucketed(cust, "customer_bucketed", 4, Seq("c_custkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the bucketing is what's under test
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and it is correct
      val expected = orders.join(cust, col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }

  test("approx distinct counts land within the configured error of exact") {
    val approx = graft.queries.MarketAnalytics.distinctCountsApprox(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = graft.queries.MarketAnalytics.distinctCounts(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (flag, (sup, part)) =>
      val (aSup, aPart) = approx(flag)
      assert(math.abs(aSup - sup).toDouble / sup < 0.15, s"$flag suppliers: $aSup vs $sup")
      assert(math.abs(aPart - part).toDouble / part < 0.15, s"$flag parts: $aPart vs $part")
    }
  }
}
