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

  test("vector_dot is callable from SQL via GraftExtensions") {
    val d = spark.sql(
      """SELECT vector_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |                  CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d""".stripMargin)
      .as[Double].collect()(0)
    assert(d == 11.0)
  }
}
