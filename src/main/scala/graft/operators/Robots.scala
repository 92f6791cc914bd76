package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt compliance gate — the crawl-policy filter every web-corpus
  * pipeline must run before content is used (the C4/CCBot discipline):
  * parse per-host robots.txt payloads into prefix rules, then admit or
  * reject each candidate URL by the Robots Exclusion Protocol's
  * LONGEST-MATCH rule (RFC 9309 §2.2.2: the most specific matching rule
  * wins; Allow beats Disallow on equal length; no match ⇒ allowed).
  *
  * Scope (documented contract): literal path prefixes only — `*` and
  * `$` pattern rules are dropped at parse time into a `n_wildcard`
  * audit count rather than half-honored (RFC 9309 allows ignoring
  * patterns, but silently treating them as literals would misdecide).
  * Group selection matches `userAgent` or `*`, case-insensitive; when
  * the file lists SEVERAL groups at the winning specificity their rules
  * MERGE (RFC 9309 §2.2.1 — crawlers must combine split groups), and
  * blank lines are insignificant (they do not close a group: rules
  * after a blank line still belong to the open group).
  *
  * Scale shape: rules are host-keyed and tiny relative to URLs; the
  * gate is ONE equi-join on host (AQE broadcasts the rule side) with a
  * per-URL argmax over its matching rules — no cross join, no regex on
  * the URL hot path (prefix compare is `startsWith`, codegen'd).
  */
object Robots {

  /** Parse robots.txt payloads into one rule per row:
    * `(host, rule_path, allow, rule_len)` plus the per-host audit
    * columns `n_wildcard` (dropped pattern rules). Input: `(host,
    * content)` — one robots.txt per host. Line grammar per RFC 9309:
    * `field: value` with `#` comments; unknown fields ignored;
    * user-agent lines open a group; consecutive UA lines share it.
    */
  def parseRules(robots: DataFrame, hostCol: String, contentCol: String,
                 userAgent: String = "graftbot"): DataFrame = {
    val ua = userAgent.toLowerCase
    import robots.sparkSession.implicits._
    val idx = robots.schema.fieldIndex(hostCol)
    val cidx = robots.schema.fieldIndex(contentCol)
    val parsed = robots.flatMap { r =>
      val host = r.getString(idx)
      val content = Option(r.getString(cidx)).getOrElse("")
      // group id -> (uaSpecificity: 2 specific / 1 star, rules)
      var groups = Vector.empty[(Int, Vector[(String, Boolean)])]
      var curUas = Vector.empty[String]
      var curRules = Vector.empty[(String, Boolean)]
      var inRules = false
      var nWildcard = 0L
      def flush(): Unit = {
        if (curUas.nonEmpty) {
          val spec =
            if (curUas.contains(ua)) 2
            else if (curUas.contains("*")) 1 else 0
          if (spec > 0) groups :+= ((spec, curRules))
        }
        curUas = Vector.empty; curRules = Vector.empty
      }
      content.split("\n").foreach { raw =>
        val line = raw.takeWhile(_ != '#').trim
        val ci = line.indexOf(':')
        if (ci > 0) {
          val field = line.substring(0, ci).trim.toLowerCase
          val value = line.substring(ci + 1).trim
          field match {
            case "user-agent" =>
              if (inRules) { flush(); inRules = false }
              curUas :+= value.toLowerCase
            case "allow" | "disallow" =>
              inRules = true
              if (value.isEmpty) {
                // empty Disallow = allow all (no rule); empty Allow is a no-op
              } else if (value.exists(c => c == '*' || c == '$')) {
                nWildcard += 1
              } else curRules :+= ((value, field == "allow"))
            case _ => () // crawl-delay, sitemap, unknown: ignored
          }
        }
        // blank lines are insignificant per RFC 9309 §2.2: only the next
        // user-agent line (or EOF) closes a group — rules appearing after
        // a blank line still belong to it
      }
      flush()
      // RFC 9309 §2.2.1: the most specific matching groups apply (exact
      // UA beats *), and ALL groups at that specificity MERGE — a file
      // that splits its rules across several `User-agent: x` groups must
      // be enforced as their union, not just the first group
      val winning = groups.map(_._1).maxOption.getOrElse(0)
      val chosen = groups.collect { case (s, rs) if s == winning => rs }
        .foldLeft(Vector.empty[(String, Boolean)])(_ ++ _)
      if (chosen.isEmpty)
        Seq((host, null.asInstanceOf[String], true, 0, nWildcard))
      else chosen.map { case (p, a) => (host, p, a, p.length, nWildcard) }
    }
    parsed.toDF(hostCol, "rule_path", "allow", "rule_len", "n_wildcard")
  }

  /** Gate `urls` (columns `idCol` — unique per row — `hostCol`,
    * `pathCol`) against parsed rules: adds `allowed: boolean` and
    * `matched_rule: string` (null when no rule matched — allowed by
    * default, including hosts with NO robots.txt at all). Longest-match
    * wins; Allow wins length ties.
    */
  def gate(urls: DataFrame, rules: DataFrame, idCol: String,
           hostCol: String, pathCol: String): DataFrame = {
    val r = rules.filter(col("rule_path").isNotNull)
      .select(col(hostCol), col("rule_path"), col("allow"), col("rule_len"))
    val joined = urls.join(r, Seq(hostCol), "left")
      .withColumn("_hit",
        col("rule_path").isNotNull &&
          col(pathCol).startsWith(col("rule_path")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("_hit").desc, col("rule_len").desc, col("allow").desc,
        col("rule_path"))
    joined.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .withColumn("allowed",
        when(col("_hit"), col("allow")).otherwise(lit(true)))
      .withColumn("matched_rule", when(col("_hit"), col("rule_path")))
      .drop("_hit", "_rn", "rule_path", "allow", "rule_len")
  }
}
