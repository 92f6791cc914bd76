package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot paths where composing built-in
  * higher-order functions would cost one closure dispatch per element.
  * These run as single tight JVM loops per row (CodegenFallback wraps the
  * eval; the loop itself is branch-light primitive code).
  */
object expressions {

  /** 64-bit SimHash of whitespace-tokenized text. For each token, a 64-bit
    * hash votes ±1 per bit position; the sign vector becomes the fingerprint.
    * Near-duplicate docs differ in few bits (compare with bit_count(a^b)).
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with codegen.CodegenFallback {
    override def dataType: DataType = LongType

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val counts = new Array[Int](64)
      var i = 0
      val n = s.length
      while (i < n) {
        while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
        val start = i
        while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
        if (i > start) {
          var h: Long = 1125899906842597L // FNV-ish seed
          var j = start
          while (j < i) { h = h * 31 + s.charAt(j); j += 1 }
          // finalize (xorshift mix for avalanche)
          h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
      java.lang.Long.valueOf(out)
    }
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
    override def prettyName: String = "simhash64"
  }

  /** Cosine similarity of two float-array embeddings — one fused loop, no
    * per-element closure dispatch. NULL if either side is NULL or lengths
    * differ; 0.0 when either norm is zero.
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with codegen.CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) java.lang.Double.valueOf(0.0)
      else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "cosine_similarity"
  }

  /** Dot product against a constant query vector (broadcast as a literal) —
    * the ANN scoring hot loop.
    */
  case class DotConst(child: Expression, query: Array[Double])
      extends UnaryExpression with codegen.CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), query.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += a.getFloat(i).toDouble * query(i); i += 1 }
      java.lang.Double.valueOf(dot)
    }
    override protected def withNewChildInternal(c: Expression): DotConst = copy(child = c)
    override def prettyName: String = "dot_const"
  }

  /** Rolling-hash (Rabin-Karp style) document fingerprint over normalized
    * text: lowercased, whitespace collapsed — stable under reformatting.
    */
  case class RollingFingerprint(child: Expression)
      extends UnaryExpression with codegen.CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
      var pendingSep = false // separator mixed lazily → leading/trailing ws ignored
      var any = false
      var i = 0
      val n = s.length
      while (i < n) {
        val c0 = s.charAt(i)
        if (Character.isWhitespace(c0)) {
          if (any) pendingSep = true
        } else {
          if (pendingSep) { h ^= ' '.toLong; h *= 0x100000001b3L; pendingSep = false }
          h ^= Character.toLowerCase(c0).toLong
          h *= 0x100000001b3L
          any = true
        }
        i += 1
      }
      java.lang.Long.valueOf(h)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
    override def prettyName: String = "rolling_fingerprint"
  }

  /** One-pass k-wise MinHash signature of an array<string> shingle set.
    * Each shingle is string-hashed ONCE; the k component hashes derive from
    * that base value by cheap integer mixing (multiply-shift family), the
    * standard replacement for k independent string hashes. O(shingles + k)
    * string work per row instead of O(shingles × k).
    */
  case class MinHashSig(child: Expression, k: Int)
      extends UnaryExpression with codegen.CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val mins = Array.fill(k)(Long.MaxValue)
      val n = arr.numElements()
      var s = 0
      while (s < n) {
        val u = arr.getUTF8String(s)
        // FNV-1a over the shingle bytes, then avalanche
        val bytes = u.getBytes
        var h = 0xCBF29CE484222325L
        var bi = 0
        while (bi < bytes.length) { h ^= (bytes(bi) & 0xFF); h *= 0x100000001B3L; bi += 1 }
        h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
        var i = 0
        var hi = h
        while (i < k) {
          // per-i derived hash: golden-ratio increment + xorshift mix
          hi += 0x9E3779B97F4A7C15L
          var m = hi
          m ^= (m >>> 30); m *= 0xBF58476D1CE4E5B9L
          m ^= (m >>> 27); m *= 0x94D049BB133111EBL
          m ^= (m >>> 31)
          if (m < mins(i)) mins(i) = m
          i += 1
        }
        s += 1
      }
      ArrayData.toArrayData(mins)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
    override def prettyName: String = "minhash_sig"
  }

  /** Fused tokenize → k-token shingle → MinHash signature in one scan of
    * the raw text — no shingle array is ever materialized. Tokens are
    * lowercased non-whitespace runs; a shingle's base hash combines the
    * window's token hashes polynomially (order-sensitive, like hashing the
    * space-joined k-gram); k' component mins derive by integer mixing.
    * Shorter-than-k docs hash their whole token sequence as one shingle,
    * mirroring Dedup.shingles' degenerate case.
    */
  case class MinHashText(child: Expression, shingleSize: Int, k: Int)
      extends UnaryExpression with codegen.CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val mins = Array.fill(k)(Long.MaxValue)
      val tokenHashes = new java.util.ArrayList[java.lang.Long](64)
      val n = s.length
      var i = 0
      while (i < n) {
        while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
        val start = i
        var h = 0xCBF29CE484222325L
        while (i < n && !Character.isWhitespace(s.charAt(i))) {
          h ^= Character.toLowerCase(s.charAt(i)).toLong
          h *= 0x100000001B3L
          i += 1
        }
        if (i > start) tokenHashes.add(h)
      }
      val m = tokenHashes.size
      def addShingle(base0: Long): Unit = {
        var base = base0
        base ^= (base >>> 33); base *= 0xFF51AFD7ED558CCDL; base ^= (base >>> 33)
        var hi = base
        var j = 0
        while (j < k) {
          hi += 0x9E3779B97F4A7C15L
          var x = hi
          x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
          x ^= (x >>> 27); x *= 0x94D049BB133111EBL
          x ^= (x >>> 31)
          if (x < mins(j)) mins(j) = x
          j += 1
        }
      }
      if (m > 0 && m < shingleSize) {
        var base = 0L
        var t = 0
        while (t < m) { base = base * 0x9E3779B97F4A7C15L + tokenHashes.get(t); t += 1 }
        addShingle(base)
      } else {
        var w = 0
        while (w + shingleSize <= m) {
          var base = 0L
          var t = w
          while (t < w + shingleSize) { base = base * 0x9E3779B97F4A7C15L + tokenHashes.get(t); t += 1 }
          addShingle(base)
          w += 1
        }
      }
      if (m == 0) addShingle(0L) // empty doc: stable degenerate signature
      ArrayData.toArrayData(mins)
    }
    override protected def withNewChildInternal(c: Expression): MinHashText = copy(child = c)
    override def prettyName: String = "minhash_text"
  }

  /** Fraction of equal components between two equal-length signature arrays
    * — the unbiased MinHash estimate of Jaccard similarity.
    */
  case class SigAgreement(left: Expression, right: Expression)
      extends BinaryExpression with codegen.CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements() || n == 0) return null
      var same = 0
      var i = 0
      while (i < n) {
        if (a.getLong(i) == b.getLong(i)) same += 1
        i += 1
      }
      java.lang.Double.valueOf(same.toDouble / n)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "sig_agreement"
  }

  /** Single-pass text statistics: one scan of the string replaces five
    * regex passes (token count, BPE-ish token count, non-space chars, ASCII
    * punctuation, Unicode letters/uppercase, stopword hits). Semantics match
    * the regex formulation exactly:
    * tokens = runs of non-[Java-regex \s] chars; letters = \p{L} (Character
    * .isLetter); uppers = \p{Lu} (category UPPERCASE_LETTER); punct = ASCII
    * \p{Punct}; stopword compare is on the lowercased token.
    */
  case class TextStats(child: Expression, stopwords: Set[String])
      extends UnaryExpression with codegen.CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("n_chars", IntegerType, nullable = false),
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("n_nonspace", IntegerType, nullable = false),
      StructField("n_punct", IntegerType, nullable = false),
      StructField("n_letters", IntegerType, nullable = false),
      StructField("n_uppers", IntegerType, nullable = false),
      StructField("n_stopwords", IntegerType, nullable = false),
      StructField("n_bpe_tokens", IntegerType, nullable = false)))

    private def isJavaRegexSpace(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    private def isAsciiPunct(c: Char): Boolean =
      (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
        (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val n = s.length
      var nTokens = 0; var nonspace = 0; var punct = 0
      var letters = 0; var uppers = 0; var stops = 0; var bpe = 0
      val tok = new java.lang.StringBuilder(24)
      var i = 0
      while (i <= n) {
        val atEnd = i == n
        val c = if (atEnd) ' ' else s.charAt(i)
        if (!atEnd && !isJavaRegexSpace(c)) {
          nonspace += 1
          if (isAsciiPunct(c)) punct += 1
          if (Character.isLetter(c)) {
            letters += 1
            if (Character.getType(c) == Character.UPPERCASE_LETTER) uppers += 1
          }
          tok.append(Character.toLowerCase(c))
        } else if (tok.length > 0) {
          nTokens += 1
          bpe += math.max(1, math.ceil(tok.length / 4.0).toInt)
          if (stopwords.contains(tok.toString)) stops += 1
          tok.setLength(0)
        }
        i += 1
      }
      InternalRow(n, nTokens, nonspace, punct, letters, uppers, stops, bpe)
    }
    override protected def withNewChildInternal(c: Expression): TextStats = copy(child = c)
    override def prettyName: String = "text_stats"
  }

  /** Entire composite quality score in ONE text scan. Mirrors the Column
    * formulation in TextFunctions.qualityScoreFromStats term by term (same
    * double-arithmetic order, Spark-ROUND HALF_UP at 4 dp) so the DuckDB
    * oracle stays bit-exact, but evaluates the underlying stats once
    * instead of once per field reference.
    */
  case class QualityScore(child: Expression, stopwords: Set[String])
      extends UnaryExpression with codegen.CodegenFallback {
    override def dataType: DataType = DoubleType

    private def isJavaRegexSpace(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    private def isAsciiPunct(c: Char): Boolean =
      (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
        (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val n = s.length
      var nTokens = 0; var nonspace = 0; var punct = 0
      var letters = 0; var uppers = 0; var stops = 0
      val tok = new java.lang.StringBuilder(24)
      var i = 0
      while (i <= n) {
        val atEnd = i == n
        val c = if (atEnd) ' ' else s.charAt(i)
        if (!atEnd && !isJavaRegexSpace(c)) {
          nonspace += 1
          if (isAsciiPunct(c)) punct += 1
          if (Character.isLetter(c)) {
            letters += 1
            if (Character.getType(c) == Character.UPPERCASE_LETTER) uppers += 1
          }
          tok.append(Character.toLowerCase(c))
        } else if (tok.length > 0) {
          nTokens += 1
          if (stopwords.contains(tok.toString)) stops += 1
          tok.setLength(0)
        }
        i += 1
      }
      if (nTokens == 0) return java.lang.Double.valueOf(0.0) // blank text
      val ntokD = nTokens.toDouble
      val lenScore = math.min(ntokD / 100.0, 1.0)
      val meanWordLen = nonspace / ntokD
      val wordLenScore = if (meanWordLen >= 3.0 && meanWordLen <= 10.0) 1.0 else 0.5
      val stopScore = math.min((stops.toDouble / nTokens) * 4.0, 1.0)
      val pRatio = if (n == 0) 0.0 else punct.toDouble / n
      val punctPen = math.max(0.0, 1.0 - pRatio * 4.0)
      val uRatio = if (letters == 0) 0.0 else uppers.toDouble / letters
      val shoutPen = math.max(0.0, 1.0 - uRatio)
      val raw = (lenScore + wordLenScore + stopScore + punctPen + shoutPen) / 5.0
      // Spark Round(double, 4) semantics: BigDecimal HALF_UP
      java.lang.Double.valueOf(
        java.math.BigDecimal.valueOf(raw)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
    }
    override protected def withNewChildInternal(c: Expression): QualityScore = copy(child = c)
    override def prettyName: String = "quality_score"
  }

  /** Marker-token language-ID in one scan: counts tokens in four tiny
    * public function-word sets, tie-breaks en > de > fr > es (exactly the
    * when-chain in TextFunctions.langId).
    */
  case class LangId(child: Expression, en: Set[String], de: Set[String],
                    fr: Set[String], es: Set[String])
      extends UnaryExpression with codegen.CodegenFallback {
    override def dataType: DataType = StringType
    private def isJavaRegexSpace(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      var cEn = 0; var cDe = 0; var cFr = 0; var cEs = 0
      var any = false
      val tok = new java.lang.StringBuilder(16)
      val n = s.length
      var i = 0
      while (i <= n) {
        val atEnd = i == n
        val c = if (atEnd) ' ' else s.charAt(i)
        if (!atEnd && !isJavaRegexSpace(c)) {
          tok.append(Character.toLowerCase(c))
        } else if (tok.length > 0) {
          any = true
          val t = tok.toString
          if (en.contains(t)) cEn += 1
          if (de.contains(t)) cDe += 1
          if (fr.contains(t)) cFr += 1
          if (es.contains(t)) cEs += 1
          tok.setLength(0)
        }
        i += 1
      }
      val out =
        if (!any) "und"
        else if (cEn == 0 && cDe == 0 && cFr == 0 && cEs == 0) "und"
        else if (cEn >= cDe && cEn >= cFr && cEn >= cEs) "en"
        else if (cDe >= cFr && cDe >= cEs) "de"
        else if (cFr >= cEs) "fr"
        else "es"
      UTF8String.fromString(out)
    }
    override protected def withNewChildInternal(c: Expression): LangId = copy(child = c)
    override def prettyName: String = "lang_id"
  }

  // ----- Column wrappers ---------------------------------------------------

  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def ex(c: Column): Expression = ColumnBridge.expression(c)

  def simhash64(c: Column): Column = col(SimHash64(ex(c)))
  def minhashSig(c: Column, k: Int): Column = col(MinHashSig(ex(c), k))
  def minhashText(c: Column, shingleSize: Int, k: Int): Column =
    col(MinHashText(ex(c), shingleSize, k))
  def sigAgreement(a: Column, b: Column): Column = col(SigAgreement(ex(a), ex(b)))
  def textStats(c: Column, stopwords: Set[String]): Column =
    col(TextStats(ex(c), stopwords))
  def qualityScore(c: Column, stopwords: Set[String]): Column =
    col(QualityScore(ex(c), stopwords))
  def langId(c: Column, en: Set[String], de: Set[String],
             fr: Set[String], es: Set[String]): Column =
    col(LangId(ex(c), en, de, fr, es))
  def cosineSimilarity(a: Column, b: Column): Column =
    col(CosineSimilarity(ex(a), ex(b)))
  def dotConst(c: Column, q: Array[Double]): Column = col(DotConst(ex(c), q))
  def rollingFingerprint(c: Column): Column = col(RollingFingerprint(ex(c)))
}
