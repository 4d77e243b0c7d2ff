package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val weights = Seq("train" -> 90, "val" -> 5, "test" -> 5)

  test("hashSplit covers every row with a valid split name") {
    val df = (0L until 2000L).toDF("id")
    val got = Sampling.hashSplit(df, "id", weights)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("train", "val", "test"))
    assert(got.values.sum == 2000)
    // affine-mod buckets are roughly uniform: train ≈ 90%
    assert(got("train") > 1600 && got("train") < 1950)
  }

  test("split assignment is stable under corpus append") {
    val before = Sampling.hashSplit((0L until 500L).toDF("id"), "id", weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = Sampling.hashSplit((0L until 1000L).toDF("id"), "id", weights)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    before.foreach { case (id, s) => assert(after(id) == s) }
  }

  test("deterministicSample is a stable subset and nests by percentage") {
    val df = (0L until 2000L).toDF("id")
    val p10 = Sampling.deterministicSample(df, "id", 10)
      .collect().map(_.getLong(0)).toSet
    val p20 = Sampling.deterministicSample(df, "id", 20)
      .collect().map(_.getLong(0)).toSet
    assert(p10.subsetOf(p20))            // smaller sample nests in larger
    assert(p10.nonEmpty && p10.size < 400)
    // re-evaluation is identical (no RNG)
    val again = Sampling.deterministicSample(df, "id", 10)
      .collect().map(_.getLong(0)).toSet
    assert(again == p10)
  }

  test("weights must sum to 100") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(Seq(1L).toDF("id"), "id", Seq("a" -> 50, "b" -> 40))
    }
  }
}
