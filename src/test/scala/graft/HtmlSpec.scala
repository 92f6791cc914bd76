package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions

/** htmlToText extraction chain: tag/script/comment removal, entity
  * decode order, whitespace normalization, SQL-lockstep contract.
  */
class HtmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def extract(html: String*): Seq[String] =
    html.toDF("h").select(TextFunctions.htmlToText(col("h")).as("x"))
      .collect().map(_.getString(0)).toSeq

  test("script and style vanish with their contents, even with embedded tags") {
    val out = extract(
      """<head><style>p{x:1}</style><script>if(1<2){s="<p>hi</p>"}</script></head><p>kept</p>""")
    assert(out == Seq("kept"))
  }

  test("comments vanish including commented-out markup") {
    assert(extract("a<!-- <p>ghost</p> \n multi-line -->b") == Seq("a b"))
  }

  test("block tags become line breaks; inline tags become spaces") {
    val out = extract(
      "<h1>Title</h1><p>one <b>bold</b> word</p><ul><li>i1</li><li>i2</li></ul>")
    assert(out == Seq("Title\none bold word\ni1\ni2"))
  }

  test("entities decode once, amp last — '&amp;lt;' stays literal '&lt;'") {
    assert(extract("a &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;b &amp; c &amp;lt; d") ==
      Seq("a <tag> \"q\" 's' b & c &lt; d"))
  }

  test("unknown entities and bare ampersands pass through verbatim") {
    assert(extract("caf&eacute; AT&T &#8212; ok") ==
      Seq("caf&eacute; AT&T &#8212; ok"))
  }

  test("whitespace collapses: runs, CRLF, spaces around breaks, edge trim") {
    assert(extract("  <p>a\r\n   b</p>\t\t<p>  c  </p>  ") ==
      Seq("a\nb\nc"))
  }

  test("attribute-laden and self-closing tags strip cleanly") {
    assert(extract("""<a href="https://x?a=1&b=2" class='z'>link</a><br/><img src="i.png"/>end""") ==
      Seq("link\nend"))
  }

  test("null routes to null") {
    val out = Seq[Option[String]](None).toDF("h")
      .select(TextFunctions.htmlToText(col("h"))).collect()
    assert(out.head.isNullAt(0))
  }

  test("Column chain and SQL chain produce identical bytes on hostile inputs") {
    // the lockstep contract behind q173's oracle: run the SQL form
    // through Spark's own SQL engine and compare (Java regex vs the SQL
    // text — DuckDB executes the same RE2-safe patterns in the gate)
    val hostile = Seq(
      "<p>a&amp;b</p><script>x<y</script>",
      "no tags at all",
      "<div><div><p>nested</p></div></div>",
      "<P CLASS='up'>UPPER</P>",
      "broken <unclosed",
      "&amp;amp; &lt;p&gt;")
    val df = hostile.toDF("html")
    df.createOrReplaceTempView("q_html_lockstep")
    val viaColumn = df.select(TextFunctions.htmlToText(col("html")).as("x"))
      .collect().map(_.getString(0)).toSeq
    val viaSql = spark.sql(
        s"SELECT ${TextFunctions.htmlToTextSql("html", global = false)} AS x FROM q_html_lockstep")
      .collect().map(_.getString(0)).toSeq
    assert(viaColumn == viaSql)
  }
}
