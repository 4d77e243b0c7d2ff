package graft.ext

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packByBudget assigns docs greedily by starting offset") {
    // 4 docs of 3 tokens each, budget 5: prefixes 0,3,6,9 → bins 0,0,1,1
    val docs = (1L to 4L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val got = Packing.packByBudget(docs, "doc_id", "text", budget = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("packingReport: every doc lands in exactly one bin, ranges contiguous") {
    val docs = (0L until 100L).map(i =>
      (i, (0 to (i % 7).toInt).map(_ => "w").mkString(" "))).toDF("doc_id", "text")
    val rep = Packing.packingReport(docs, "doc_id", "text", budget = 64)
      .orderBy("bin").collect()
    assert(rep.map(_.getAs[Long]("n_docs")).sum == 100)
    // bins partition the id range in order: bin b's last_id + 1 == bin b+1's first_id
    rep.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("last_id") + 1 == b.getAs[Long]("first_id"))
      case _ =>
    }
    // a bin overflows its budget by at most one document's tokens
    rep.dropRight(1).foreach { r =>
      assert(r.getAs[Long]("sum_tokens") >= 64 - 7 &&
        r.getAs[Long]("sum_tokens") <= 64 + 7)
    }
  }

  test("budget must be positive") {
    intercept[IllegalArgumentException] {
      Packing.packByBudget(Seq((1L, "a")).toDF("doc_id", "text"), "doc_id", "text", 0)
    }
  }
}
