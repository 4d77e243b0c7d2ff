package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlOps.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("the three crawl surface forms of one page canonicalize identically") {
    val out = canon(
      "https://www.src0.example.com/docs/3?utm_source=feed&b=2&a=1",
      "http://src0.example.com/docs/3/?a=1&b=2",
      "HTTPS://src0.example.com/docs/3?b=2&a=1")
    assert(out.distinct == Seq("src0.example.com/docs/3?a=1&b=2"), out)
  }

  test("canonicalization steps: scheme, www, slash runs, utm, param sort, empty query") {
    assert(canon("https://www.A.com/x///") == Seq("a.com/x"))
    assert(canon("http://a.com/x?utm_source=1&utm_medium=2") == Seq("a.com/x"))
    assert(canon("a.com/x?z=1&a=2&m=3") == Seq("a.com/x?a=2&m=3&z=1"))
    assert(canon("a.com") == Seq("a.com"))
    // the query begins at the FIRST '?': later '?' are query content
    assert(canon("a.com/x?b=2?tail&a=1") == Seq("a.com/x?a=1&b=2?tail"))
  }

  test("hostOf reads everything before the first path slash") {
    val h = Seq("src0.example.com/docs/3?a=1", "host.only")
      .toDF("c").select(UrlOps.hostOf(col("c"))).collect().map(_.getString(0))
    assert(h.toSeq == Seq("src0.example.com", "host.only"))
  }

  test("urlHostDedup: every host collapses 3 variants per page, cap 6 binds") {
    val rows = graft.queries.DedupQueries.urlHostDedup(spark, sf001)
      .collect()
    assert(rows.length == 20) // one per source host
    rows.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      val nUrls = r.getAs[Long]("n_urls")
      val nKept = r.getAs[Long]("n_kept")
      // 25 docs per host at sf0.001, pages of 3 → 9 canonical urls
      assert(nDocs == 25 && nUrls == 9, s"unexpected dedup shape: $r")
      assert(nKept == 6, s"cap did not bind: $r")
      assert(r.getAs[Long]("n_dup_removed") == nDocs - nUrls)
      assert(r.getAs[Long]("n_cap_removed") == nUrls - nKept)
    }
  }
}
