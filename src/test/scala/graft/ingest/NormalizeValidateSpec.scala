package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Normalization (T1–T9) and validation (P2–P4) golden cases ported from
  * the reference's test fixtures (SURVEY.md §5.1:
  * `tests/test_krx_new_listing_crawler.py:158-174` numeric goldens,
  * `tests/test_sync_delisted_stocks.py:139-185` normalize/typing).
  */
class NormalizeValidateSpec extends SparkSpec {
  import spark.implicits._

  test("lenientDouble parses '10,000원'-style strings; garbage → null") {
    val out = Seq("10,000원", "1,234.5", "abc", "").toDF("s")
      .select(Normalize.lenientDouble(col("s")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(10000.0), Some(1234.5), None, None))
  }

  test("lenientDate parses yyyyMMdd with separators; malformed → null") {
    val out = Seq("2024-01-31", "20240131", "2024/01/31", "notadate", "99999999")
      .toDF("s").select(Normalize.lenientDate(col("s")).cast("string").as("d"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.take(3).forall(_.contains("2024-01-31")))
    assert(out(3).isEmpty && out(4).isEmpty)
  }

  test("digitsPrefix extracts the 6-digit symbol from mixed text") {
    val out = Seq("A005930 삼성전자", "12345", "").toDF("s")
      .select(Normalize.digitsPrefix(col("s"), 6).as("c")).as[String].collect()
    assert(out.toSeq == Seq("005930", "12345", ""))
  }

  test("renameBySubstring uses first-match-wins substring semantics") {
    val df = Seq((1, 2, 3)).toDF("회사명column", "code_col", "untouched")
    val out = Normalize.renameBySubstring(df,
      Seq("회사명" -> "name", "code" -> "symbol", "사명" -> "never_wins"))
    assert(out.columns.toSeq == Seq("name", "symbol", "untouched"))
  }

  test("emptyToNull and trimAll act on all string columns") {
    val df = Seq(("", "  x  ", 1)).toDF("a", "b", "n")
    val out = Normalize.emptyToNull(Normalize.trimAll(df)).collect()(0)
    assert(out.isNullAt(0) && out.getString(1) == "x" && out.getInt(2) == 1)
  }

  test("withDefaults fills nulls only") {
    val df = Seq((Some("x"), None: Option[String])).toDF("a", "b")
    val out = Normalize.withDefaults(df,
      Map("a" -> lit("D"), "b" -> lit("D"))).as[(String, String)].collect()
    assert(out.toSeq == Seq(("x", "D")))
  }

  test("validation rules: P2 regex key, P3 non-empty, P4 date range") {
    val df = Seq(
      ("005930", "ok", "2020-01-01"),
      ("5930", "bad-key", "2020-01-01"),
      ("005931", "", "2020-01-01"),
      ("005932", "bad-date", "1970-01-01")
    ).toDF("symbol", "name", "d").withColumn("d", col("d").cast("date"))
    val out = Validate.accept(df, Seq(
      Validate.keyMatches(col("symbol"), "^[0-9]{6}$"),
      Validate.nonEmpty(col("name")),
      Validate.dateInRange(col("d"), "1990-01-01")))
    assert(out.select("symbol").as[String].collect().toSeq == Seq("005930"))
    assert(Validate.reject(df, Seq(Validate.keyMatches(col("symbol"), "^[0-9]{6}$")))
      .count() == 1)
  }

  test("requireColumns fails fast at plan time") {
    val df = Seq((1, 2)).toDF("a", "b")
    assertThrows[IllegalArgumentException](
      Validate.requireColumns(df, Seq("a", "missing")))
  }
}
