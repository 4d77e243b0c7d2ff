package graft.model

import graft.SparkSpec

/** The SQL entry point: registered views must answer the reference's SQL
  * shapes directly and agree with the DataFrame form.
  */
class CatalogSpec extends SparkSpec {

  test("base tables and derived views are queryable via spark.sql") {
    Catalog.registerAll(spark, sf001)
    Catalog.registerViews(spark, sf001)
    val viaSql = spark.sql(
      """SELECT c.c_mktsegment, COUNT(*) AS n
        |FROM latest_prices lp JOIN customer c ON lp.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaSql.nonEmpty && viaSql.map(_._2).sum ==
      Catalog.latestPrices(spark, sf001).count())
  }

  test("daily_market_summary view matches the q03 DataFrame form") {
    Catalog.registerAll(spark, sf001)
    Catalog.registerViews(spark, sf001)
    val view = spark.sql("SELECT * FROM daily_market_summary")
    val df = graft.queries.MarketAnalytics.dailySummary(spark, sf001)
    assert(view.count() == df.count())
    assert(view.orderBy("order_date").exceptAll(df).count() == 0)
  }

  test("filters push through views to the scan") {
    Catalog.registerAll(spark, sf001)
    val p = spark.sql("SELECT o_orderkey FROM orders WHERE o_custkey = 7")
      .queryExecution.executedPlan.toString
    assert(p.contains("EqualTo(o_custkey,7)"), s"no pushdown through view:\n$p")
  }
}
