package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Co2Functions, TextFunctions}

/** Property-based checks over the scalar-function edge domains (SURVEY §5),
  * evaluated through the real Column expressions on a local session.
  * Samples are drawn from ScalaCheck generators with a fixed seed
  * (deterministic CI); each property batch-evaluates one DataFrame so the
  * property runs through the same codegen path as production queries.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private val N = 200
  private def samples[A](g: Gen[A]): Seq[A] =
    (0 until N).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val posCo2: Gen[Double] = Gen.choose(1.0, 1000.0)

  test("volatility is symmetric, non-negative; NULL on invalid domain") {
    val pairs = samples(Gen.zip(posCo2, posCo2))
    val rows = pairs.toDF("a", "b").select(
      Co2Functions.co2Volatility(col("a"), col("b")).as("ab"),
      Co2Functions.co2Volatility(col("b"), col("a")).as("ba")).collect()
    rows.foreach { r =>
      assert(!r.isNullAt(0) && r.getDouble(0) >= 0.0)
      assert(r.getDouble(0) == r.getDouble(1)) // symmetry
    }
    // invalid domain: non-positive or null partner
    val inv = samples(posCo2).toDF("a").select(
      Co2Functions.co2Volatility(col("a"), lit(-1.0)),
      Co2Functions.co2Volatility(col("a"), lit(null).cast("double"))).collect()
    inv.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1)))
  }

  test("normalize stays in [0,1] for in-range values; 0.5 on degenerate range") {
    val trips = samples(Gen.zip(posCo2, posCo2, posCo2)).map { case (x0, a, b) =>
      val lo = math.min(a, b); val hi = math.max(a, b)
      (math.max(lo, math.min(hi, x0)), lo, hi)
    }
    val rows = trips.toDF("x", "lo", "hi").select(
      Co2Functions.normalizeCo2(col("x"), col("lo"), col("hi")).as("n"),
      col("lo"), col("hi")).collect()
    rows.foreach { r =>
      val n = r.getDouble(0)
      if (r.getDouble(1) == r.getDouble(2)) assert(n == 0.5)
      else assert(n >= 0.0 && n <= 1.0)
    }
  }

  test("percent change recovers the applied factor within fp tolerance") {
    val pairs = samples(Gen.zip(posCo2, Gen.choose(-0.9, 9.0)))
    val rows = pairs.map { case (p, f) => (p, p * (1 + f), f) }
      .toDF("prev", "cur", "f")
      .select(Co2Functions.co2PercentChange(col("prev"), col("cur")).as("pct"), col("f"))
      .collect()
    rows.foreach { r =>
      val pct = r.getDouble(0); val f = r.getDouble(1)
      assert(math.abs(pct - f * 100.0) < 1e-6 * math.max(1.0, math.abs(f * 100)))
    }
  }

  private val word: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text: Gen[String] = Gen.listOf(word).map(_.mkString(" "))

  test("quality score is always in [0,1]; token count matches regex split") {
    val ts = samples(text)
    val rows = ts.toDF("text").select(
      col("text"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.tokenCount(col("text")).as("n")).collect()
    rows.foreach { r =>
      val t = r.getString(0)
      val q = r.getDouble(1)
      assert(q >= 0.0 && q <= 1.0, s"quality $q for '$t'")
      val expected = if (t.trim.isEmpty) 0 else t.trim.split("\\s+").length
      assert(r.getInt(2) == expected, s"tokens for '$t'")
    }
  }

  test("flesch stats match a hand implementation of the documented heuristic") {
    val ts = samples(text) ++ Seq(
      "The cat sat. The dog ran!", "One", "e e e", "same same same.",
      "Able bakers make cake late; time flies?!", "  spaced   out  .  ")
    val rows = ts.toDF("text").select(col("text"),
      TextFunctions.fleschStats(col("text")).as("st"),
      TextFunctions.fleschReadingEase(col("text")).as("f")).collect()
    rows.foreach { r =>
      val t = r.getString(0)
      if (t == null || t.trim.isEmpty) {
        assert(r.isNullAt(1) && r.isNullAt(2), s"blank '$t' must be NULL")
      } else {
        val lt = t.trim.toLowerCase
        val w = t.trim.split("\\s+").length
        val sent = math.max(1, "[.!?]+".r.findAllIn(t).length)
        val groups = "[aeiouy]+".r.findAllIn(lt).length
        val silent = "[b-df-hj-np-tv-z]e\\b".r.findAllIn(lt).length
        val syl = math.max(w, groups - silent)
        val st = r.getStruct(1)
        assert((st.getInt(0), st.getInt(1), st.getInt(2)) == ((w, sent, syl)),
          s"stats for '$t'")
        val expected = 206.835 - 1.015 * (w.toDouble / sent) -
          84.6 * (syl.toDouble / w)
        assert(r.getDouble(2) == expected, s"flesch for '$t'")
      }
    }
  }

  test("fingerprint is invariant to case and whitespace runs, sensitive to content") {
    val ws = samples(Gen.nonEmptyListOf(word)).filter(_.nonEmpty)
    val pairs = ws.map { w =>
      (w.mkString(" "), "  " + w.map(_.toUpperCase).mkString("   ") + " ")
    }
    val rows = pairs.toDF("a", "b").select(
      graft.plans.expressions.rollingFingerprint(col("a")),
      graft.plans.expressions.rollingFingerprint(col("b"))).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // content sensitivity: distinct token lists hash apart (no collision in sample)
    val fps = ws.map(_.mkString(" ")).distinct.toDF("t")
      .select(graft.plans.expressions.rollingFingerprint(col("t")))
      .collect().map(_.getLong(0))
    assert(fps.distinct.length == fps.length)
  }

  test("TrigramStats kernel == size/array_distinct column spec over adversarial strings") {
    // q39's oracle depends on the fused kernel reproducing the column
    // formulation exactly: repeated trigrams, whitespace-edge empty tokens,
    // unicode case-folding under lower(), and short/blank/null docs.
    val token: Gen[String] = Gen.oneOf(
      Gen.oneOf("a", "b", "c"), // tiny alphabet → real duplicate trigrams
      Gen.oneOf("Größe", "naïve", "ÉLAN", "日本語", "x!?"))
    val sep: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val text: Gen[String] = for {
      k <- Gen.choose(0, 12)
      toks <- Gen.listOfN(k, token)
      seps <- Gen.listOfN(k, sep)
      lead <- Gen.oneOf("", " ", "\t")
      tail <- Gen.oneOf("", " ", "\n")
    } yield lead + toks.zip(seps).map { case (t, s) => t + s }.mkString + tail
    val docs = (samples(text) ++ Seq("", " ", "\t\n", "a b", "a b a b a b a b")).distinct
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .union(Seq((-1L, null.asInstanceOf[String])).toDF("id", "text"))

    val g = {
      val toks = split(lower(trim(col("text"))), "\\s+")
      when(col("text").isNull || size(toks) < 3, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", slice(toks, i, lit(3)))))
    }
    val spec = df.select(col("id"), size(g).as("n"), size(array_distinct(g)).as("d"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val fused = df.select(col("id"),
        TextFunctions.trigramRepetition(col("text")).as("r"))
      .select(col("id"), col("r.n_grams"), col("r.n_distinct"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(fused == spec)
    assert(spec.values.exists { case (n, d) => n > d && n > 0 },
      "generator must produce real duplicated trigrams")
  }

  test("md5SimHash60 kernel == SQL-expression spec over adversarial strings") {
    // The q24 oracle depends on the kernel reproducing the ANSI-SQL
    // formulation bit-for-bit, INCLUDING tokenization edge cases: leading/
    // trailing tabs and newlines (split keeps their empty tokens), unicode
    // letters, runs of mixed whitespace, and empty/whitespace-only text.
    val token: Gen[String] = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
      Gen.oneOf("Größe", "naïve", "ÉLAN", "日本語", "a-b_c", "x!?"))
    val sep: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", " \t ", "\r\n")
    val text: Gen[String] = for {
      toks <- Gen.listOfN(6, token)
      seps <- Gen.listOfN(7, sep)
      lead <- Gen.oneOf("", " ", "\t", "\n")
      tail <- Gen.oneOf("", " ", "\t", "\n")
    } yield lead + toks.zip(seps).map { case (t, s) => t + s }.mkString + tail
    val docs = (samples(text) ++ Seq("", " ", "\t", "\n", "  \t\n  ")).distinct
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

    val words = df.select(col("id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .select(col("id"),
        conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("h"))
    val bitSums = (0 until 60).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$b"))
    val fpCol = (0 until 60).map(b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    val sqlFp = words.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), fpCol.as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kernelFp = df.select(col("id"),
      graft.plans.expressions.md5SimHash60(col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernelFp == sqlFp)
  }

  test("minhash signature agreement equals 1 iff same shingle content") {
    val ws = samples(Gen.nonEmptyListOf(word)).filter(_.length >= 4).take(50)
    val docs = ws.map(_.mkString(" "))
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val sig = graft.plans.expressions.minhashText(col("t"), 3, 64)
    val rows = df.select(sig.as("s1"),
      graft.plans.expressions.minhashText(upper(col("t")), 3, 64).as("s2")).collect()
    // lowercasing inside the expression → case-insensitive signatures
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("normalizeText agrees with rollingFingerprint's normalization") {
    import graft.plans.ExprKernels
    import org.apache.spark.unsafe.types.UTF8String
    val texts: Gen[String] = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("Hello", "  ", "WORLD", "\t", "\n", "é", "ok"))
        .map(_.mkString))
    samples(texts).foreach { s =>
      val u = UTF8String.fromString(s)
      val n = ExprKernels.normalizeText(u)
      // normalization is idempotent, and the fingerprint of the normalized
      // text IS the fingerprint of the original — so md5(normalizeText(s))
      // (the exact-dedup content key) groups exactly the texts the 64-bit
      // fingerprint groups, minus its collisions
      assert(ExprKernels.normalizeText(n) == n, s"'$s'")
      assert(ExprKernels.rollingFingerprint(n) == ExprKernels.rollingFingerprint(u), s"'$s'")
      // normalized text never carries leading/trailing/doubled whitespace
      val ns = n.toString
      assert(ns == ns.trim && !ns.contains("  "), s"'$s' -> '$ns'")
    }
  }

  test("zone-map string encoding: lossless round trip, JSON-regex-safe output") {
    import graft.storage.ZoneMaps
    val bytes: Gen[Array[Byte]] =
      Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    samples(bytes).foreach { b =>
      val enc = ZoneMaps.pctEncode(b)
      assert(ZoneMaps.pctDecode(enc).sameElements(b))
      // the commit log is regex-parsed: no structural byte may leak through
      assert(!enc.exists(c => "{}[]\",:\\%".contains(c) && c != '%' ||
        c == '"' || c == '}' || c == '{' || c == '[' || c == ']' ||
        c == ',' || c == ':' || c == '\\'), enc)
    }
  }

  test("zone-map byte ordering agrees with Spark's UTF8String binary order") {
    import graft.storage.ZoneMaps
    import org.apache.spark.unsafe.types.UTF8String
    val strs: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.listOf(Gen.oneOf('a', 'é', '中', 'z', '0', ' ', 'ÿ')).map(_.mkString))
    samples(Gen.zip(strs, strs)).foreach { case (a, b) =>
      val za = ZoneMaps.bytesCompare(
        a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val ua = UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
      assert(Integer.signum(za) == Integer.signum(ua), s"'$a' vs '$b'")
    }
  }

  test("quality filter: reasons are consistent with passed on arbitrary text") {
    import graft.operators.QualityFilter
    val texts: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.listOf(Gen.oneOf("the", "fox", "###", "...", "a", "-", "\n", " ",
        "12345", "wordwordwordword")).map(_.mkString(" ")),
      Gen.const(""), Gen.const("   \n  "))
    val rows = samples(texts).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val flagged = QualityFilter.flags(rows, "text",
      QualityFilter.Config(minWords = 2, maxWords = 50, minStopwordHits = 1))
      .select("passed", "reasons").collect()
    flagged.foreach { r =>
      // passed ⟺ reasons empty — the routing invariant every sink uses
      assert(r.getBoolean(0) == r.getString(1).isEmpty, r.toString)
      // reasons stay within the rule vocabulary, alphabetically ordered
      val rs = r.getString(1).split(",").filter(_.nonEmpty).toSeq
      assert(rs == rs.sorted, r.toString)
      val vocab = Set("alpha_ratio", "bullet_lines", "ellipsis_lines",
        "mean_word_len", "stopword_hits", "symbol_ratio", "word_count")
      assert(rs.forall(vocab), r.toString)
    }
  }

  test("PSI: zero iff identical histograms; always finite; symmetric under swap") {
    import graft.operators.DriftMonitor
    val hist: Gen[Seq[(String, Double, Long)]] =
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 5), Gen.choose(1L, 50L)))
        .map(_.map { case (b, c) => ("g", b.toDouble, c) }
          .groupBy(_._2).map { case (v, xs) => ("g", v, xs.map(_._3).sum) }.toSeq)
    samples(Gen.zip(hist, hist)).take(40).foreach { case (h1, h2) =>
      val d1 = h1.toDF("g", "_v", "cnt")
      val d2 = h2.toDF("g", "_v", "cnt")
      val fwd = DriftMonitor.psi(d1, d2, Seq("g")).head.getDouble(1)
      val rev = DriftMonitor.psi(d2, d1, Seq("g")).head.getDouble(1)
      assert(java.lang.Double.isFinite(fwd))
      assert(fwd == rev, s"asymmetric: $fwd vs $rev")
      if (h1.toSet == h2.toSet) assert(fwd == 0.0)
    }
  }

  test("starComponents equals driver union-find on arbitrary random graphs") {
    // 12 generated graphs across densities (sparse forests to dense
    // near-cliques) — the property that matters: EXACT agreement with the
    // reference union-find on every shape, not just handpicked cases
    val graphs = (0 until 12).map { i =>
      val rng = new scala.util.Random(1000 + i)
      val n = 5 + rng.nextInt(60)
      val m = rng.nextInt(3 * n)
      (0 until m).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
    }
    graphs.foreach { edges =>
      val expected: Map[Long, Long] = {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          r
        }
        edges.filter(e => e._1 != e._2).foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        parent.keys.map(k => k -> find(k)).toMap
      }
      val got =
        if (edges.isEmpty) Map.empty[Long, Long]
        else graft.operators.Dedup.starComponents(edges.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"edges=$edges")
    }
  }
}
