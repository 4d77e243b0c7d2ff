package graft.sources

import graft.SparkSpec

/** Charset-fallback decode: the EUC-KR → UTF-8 → CP949 → latin1 chain
  * must pick the first charset that decodes cleanly, survive arbitrary
  * binary garbage, and run distributed over a binaryFile drop.
  */
class TextDecodeSpec extends SparkSpec {

  private val korean = "삼성전자 상장폐지 목록"

  test("EUC-KR bytes decode as EUC-KR (first in chain)") {
    val (text, cs) = TextDecode.decode(korean.getBytes("EUC-KR"))
    assert(text == korean && cs == "EUC-KR")
  }

  test("UTF-8-only bytes fall through to UTF-8") {
    val s = "price € 100"  // € is a 3-byte UTF-8 sequence invalid in EUC-KR
    val (text, cs) = TextDecode.decode(s.getBytes("UTF-8"))
    assert(text == s && cs == "UTF-8")
  }

  test("arbitrary binary garbage lands in latin1 and never fails") {
    val bytes = Array[Byte](-1, -2, 0x41, -1, -1)  // invalid in all strict charsets
    val (text, cs) = TextDecode.decode(bytes)
    assert(cs == "ISO-8859-1" && text.length == 5 && text(2) == 'A')
  }

  test("distributed binaryFile decode tags each file with its charset") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dec")
    java.nio.file.Files.write(dir.resolve("kr.html"), korean.getBytes("EUC-KR"))
    java.nio.file.Files.write(dir.resolve("u8.html"), "price € 100".getBytes("UTF-8"))
    val rows = TextDecode.readTextWithFallback(spark, s"$dir/*.html")
      .collect().map(d => d.path.split('/').last -> ((d.text, d.charset))).toMap
    assert(rows("kr.html") == ((korean, "EUC-KR")))
    assert(rows("u8.html") == (("price € 100", "UTF-8")))
  }

  test("end-to-end: EUC-KR crawl drop parses through the HTML table source") {
    val html =
      s"""<table>
         |<tr><th>회사명</th><th>코드</th></tr>
         |<tr><td>삼성전자</td><td>005930</td></tr>
         |<tr><td>카카오</td><td>035720</td></tr>
         |</table>""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("graft_dec_html")
    java.nio.file.Files.write(dir.resolve("drop.html"), html.getBytes("EUC-KR"))
    val out = TextDecode.readHtmlTables(spark, s"$dir/*.html", Seq("name", "code"))
      .orderBy("code").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("삼성전자", "005930"), ("카카오", "035720")))
  }
}
