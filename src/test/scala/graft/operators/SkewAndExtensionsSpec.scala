package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew-salting equivalence (salted plans must return exactly the plain
  * plan's results) and the SparkSessionExtensions SQL-function
  * registration.
  */
class SkewAndExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin returns exactly the unsalted join result") {
    val li = graft.model.Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_suppkey", "l_extendedprice")
    val sup = graft.model.Tables.supplier(spark, sf001)
      .select("s_suppkey", "s_name")
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(sup, Seq("l_suppkey"))
    val salted = Skew.saltedEquiJoin(li, sup, Seq("l_suppkey"), salts = 8)
      .select(plain.columns.map(col): _*)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedSumCount matches the direct aggregation") {
    val df = Seq(("hot", 1.0), ("hot", 2.0), ("hot", 3.0), ("cold", 4.0))
      .toDF("k", "v")
    val out = Skew.saltedSumCount(df, Seq("k"), "v", salts = 4)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("cold", 1L, 4.0), ("hot", 3L, 6.0)))
  }

  test("saltedTopKPerGroup equals the plain rank window (q81 forms agree)") {
    // Synthetic skew: one group holds most rows; the (v desc, id) order
    // is total, so both forms must produce the identical ranked winners.
    val df = (0L until 2000L)
      .map(i => (i, if (i < 1800) "hot" else s"g${i % 3}", (i * 37) % 1009))
      .toDF("id", "grp", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("v").desc, col("id"))
    val plain = df.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 7)
      .collect().map(r => (r.getString(1), r.getInt(3), r.getLong(0))).toSet
    for (salts <- Seq(1, 4, 16)) {
      val salted = Skew.saltedTopKPerGroup(df, Seq("grp"),
          Seq(col("v").desc, col("id")), k = 7, salts = salts)
        .collect().map(r => (r.getString(1), r.getInt(3), r.getLong(0))).toSet
      assert(salted == plain, s"ranked winners diverged at salts=$salts")
    }
    // and the registered q81 pair agrees end-to-end on real tables
    val a = graft.queries.WarehouseAnalytics.topSuppliersPerNation(spark, sf001).collect().toSeq
    val b = graft.queries.WarehouseAnalytics.topSuppliersPerNationSalted(spark, sf001)
      .collect().toSeq
    assert(a == b)
  }

  test("vector_dot is callable from SQL via GraftExtensions") {
    val d = spark.sql(
      """SELECT vector_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |                  CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d""".stripMargin)
      .as[Double].collect()(0)
    assert(d == 11.0)
  }
}
