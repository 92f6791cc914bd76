package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Robots

/** robots.txt parse + RFC 9309 longest-match gate. */
class RobotsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def rulesOf(content: String, ua: String = "graftbot") =
    Robots.parseRules(Seq(("h", content)).toDF("host", "content"),
        "host", "content", ua)
      .collect()
      .map(r => (Option(r.getString(1)), r.getBoolean(2), r.getLong(4)))
      .toSet

  test("parse: star group, comments, unknown fields, empty disallow") {
    val rs = rulesOf(
      "# policy\nUser-agent: *\nDisallow: /x/ # inline\n" +
        "Crawl-delay: 5\nSitemap: https://h/s.xml\nDisallow:\nAllow: /x/ok\n")
    assert(rs == Set((Some("/x/"), false, 0L), (Some("/x/ok"), true, 0L)))
  }

  test("parse: bot-specific group outranks star; star alone matches") {
    val txt = "User-agent: graftbot\nDisallow: /only-bot\n\n" +
      "User-agent: *\nDisallow: /everyone\n"
    assert(rulesOf(txt) == Set((Some("/only-bot"), false, 0L)))
    assert(rulesOf(txt, ua = "elsebot") ==
      Set((Some("/everyone"), false, 0L)))
  }

  test("parse: non-matching groups yield a no-rule marker row") {
    assert(rulesOf("User-agent: otherbot\nDisallow: /\n") ==
      Set((None, true, 0L)))
  }

  test("parse: wildcard rules are dropped and audited, not mis-honored") {
    val rs = rulesOf(
      "User-agent: *\nDisallow: /a*/b\nDisallow: /c$\nDisallow: /plain\n")
    assert(rs == Set((Some("/plain"), false, 2L)))
  }

  test("parse: shared group — consecutive UA lines get the same rules") {
    val rs = rulesOf(
      "User-agent: graftbot\nUser-agent: otherbot\nDisallow: /shared\n")
    assert(rs == Set((Some("/shared"), false, 0L)))
  }

  test("parse: split groups at the same specificity MERGE (RFC 9309 §2.2.1)") {
    val txt = "User-agent: graftbot\nDisallow: /one\n\n" +
      "User-agent: otherbot\nDisallow: /other\n\n" +
      "User-agent: graftbot\nDisallow: /two\n"
    assert(rulesOf(txt) ==
      Set((Some("/one"), false, 0L), (Some("/two"), false, 0L)))
    // star groups merge the same way when star is the best match
    val star = "User-agent: *\nDisallow: /a\n\nUser-agent: *\nAllow: /a/b\n"
    assert(rulesOf(star, ua = "elsebot") ==
      Set((Some("/a"), false, 0L), (Some("/a/b"), true, 0L)))
  }

  test("parse: blank lines do not close a group — later rules still belong") {
    val rs = rulesOf("User-agent: *\nDisallow: /kept\n\nDisallow: /also\n")
    assert(rs == Set((Some("/kept"), false, 0L), (Some("/also"), false, 0L)))
  }

  test("gate: longest match wins; Allow beats Disallow on ties; default allow") {
    val rules = Robots.parseRules(Seq(
      ("h", "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n"))
      .toDF("host", "content"), "host", "content")
    val urls = Seq("/", "/private/secret", "/private/pub/ok", "/priv")
      .map(p => (p, "h", p)).toDF("uid", "host", "path")
    val out = Robots.gate(urls, rules, "uid", "host", "path")
      .collect().map(r => r.getAs[String]("path") ->
        r.getAs[Boolean]("allowed")).toMap
    assert(out == Map("/" -> true, "/private/secret" -> false,
      "/private/pub/ok" -> true, "/priv" -> true))
  }

  test("gate: hosts without any robots.txt are allowed; urls not deduped") {
    val rules = Robots.parseRules(
      Seq(("h", "User-agent: *\nDisallow: /x\n")).toDF("host", "content"),
      "host", "content")
    val urls = Seq(("a", "nohost", "/x"), ("b", "h", "/x"), ("c", "h", "/x"))
      .toDF("uid", "host", "path")
    val out = Robots.gate(urls, rules, "uid", "host", "path")
      .collect().map(r => r.getAs[String]("uid") ->
        r.getAs[Boolean]("allowed")).toMap
    assert(out == Map("a" -> true, "b" -> false, "c" -> false))
  }
}
