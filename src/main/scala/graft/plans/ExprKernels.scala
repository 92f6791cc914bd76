package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Static per-row kernels shared by the interpreted eval AND the generated
  * code of graft's custom expressions: `doGenCode` emits a single static
  * call, so the expressions stay inside whole-stage codegen instead of
  * falling back (CodegenFallback splits the codegen span and boxes rows).
  */
object ExprKernels {

  @inline private def fmix(h0: Long): Long = {
    var h = h0
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33); h
  }

  /** 64-bit hashes of a document's word n-grams WITHOUT materializing the
    * gram strings: token hashes are computed once, each gram hash mixes
    * its n token hashes positionally. Used on BOTH sides of the
    * decontamination pre-filter, so only self-consistency matters — exact
    * string equality is re-established by the rescore phase. Token
    * semantics match [[trigramStats]]/`wordNgrams`:
    * `split(lower(trim(text)), "\s+")` at limit -1.
    */
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** Distinct word k-shingles of a document in ONE pass — the kernel
    * behind [[graft.operators.Dedup.shingles]]. Output is byte-identical
    * to the declarative formulation `array_distinct(transform(sequence(…),
    * i => concat_ws(" ", slice(split(lower(trim(s)), "\s+"), i, k))))` —
    * including the shorter-than-k whole-token-sequence shingle, empty
    * tokens from Java split-at-limit-(-1) semantics, and array_distinct's
    * first-occurrence order (DedupSpec pins the equivalence on random
    * corpora). Exists because the declarative chain materializes and
    * churns intermediate arrays per row — measured 5× slower than this
    * single scan at bench scale, as the dominant cost of the exact-rescore
    * dedup family.
    */
  def shingleSet(u: UTF8String, k: Int): ArrayData = {
    val toks = WS.split(u.trim.toLowerCase.toString, -1)
    val out = new java.util.LinkedHashSet[String]
    val m = toks.length
    if (m < k) out.add(String.join(" ", toks: _*))
    else {
      val sb = new java.lang.StringBuilder(64)
      var w = 0
      while (w + k <= m) {
        sb.setLength(0)
        var t = w
        while (t < w + k) {
          if (t > w) sb.append(' ')
          sb.append(toks(t)); t += 1
        }
        out.add(sb.toString)
        w += 1
      }
    }
    val arr = new Array[AnyRef](out.size)
    var i = 0
    val it = out.iterator()
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  def ngramHashes(u: UTF8String, n: Int): ArrayData = {
    val toks = u.trim.toLowerCase.toString.split("\\s+", -1)
    val m = toks.length - (n - 1)
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      // FNV-1a over the token's chars, finalized
      var h = 0xCBF29CE484222325L
      val t = toks(i); var j = 0
      while (j < t.length) { h ^= t.charAt(j); h *= 0x100000001B3L; j += 1 }
      th(i) = fmix(h)
      i += 1
    }
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 0x9E3779B97F4A7C15L
      var k = 0
      while (k < n) { h = fmix(h ^ th(i + k)) * 0x100000001B3L; k += 1 }
      out(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Fused word-trigram repetition stats: `(n_grams, n_distinct)` in ONE
    * pass — replaces materializing the trigram string array twice (once
    * under `size`, once under `array_distinct`). Token semantics are
    * bit-compatible with `split(lower(trim(text)), "\s+")` at Spark's
    * default limit -1: SQL trim strips 0x20 only, so an edge tab still
    * yields an empty token, exactly like the column formulation (and the
    * DuckDB oracle). Distinctness is over the literal space-joined trigram
    * strings — no hashing, so no collision caveat on the exactness gate.
    */
  def trigramStats(u: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = u.trim.toLowerCase.toString
    val toks = s.split("\\s+", -1)
    val n = toks.length - 2
    if (n <= 0)
      return org.apache.spark.sql.catalyst.InternalRow(0, 0)
    val seen = new java.util.HashSet[String](Integer.highestOneBit(n) * 2)
    var d = 0
    val sb = new java.lang.StringBuilder(48)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
      if (seen.add(sb.toString)) d += 1
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(n, d)
  }

  def simhash64(u: UTF8String): Long = {
    val s = u.toString
    val counts = new Array[Int](64)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) {
        var h: Long = 1125899906842597L
        var j = start
        while (j < i) { h = h * 31 + s.charAt(j); j += 1 }
        h = fmix(h)
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
    out
  }

  def cosineSimilarity(a: ArrayData, b: ArrayData): java.lang.Double = {
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

  /** Johnson–Lindenstrauss ±1 random projection, fused: out[j] =
    * Σᵢ sign(i,j)·v[i] with signs packed one 64-bit mask per output
    * dimension (bit i of masks[j] set ⇒ +1). One pass over the input
    * vector per output dim, no per-element boxing.
    */
  def randomProject(a: ArrayData, masks: Array[Long]): ArrayData = {
    val n = math.min(a.numElements(), 64)
    val out = new Array[Double](masks.length)
    var j = 0
    while (j < masks.length) {
      val m = masks(j)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val v = a.getFloat(i).toDouble
        acc += (if (((m >>> i) & 1L) == 1L) v else -v)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  def dotConst(a: ArrayData, query: Array[Double]): Double = {
    val n = math.min(a.numElements(), query.length)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * query(i); i += 1 }
    dot
  }

  /** Unicode text cleanup — NFC canonical composition (java.text.Normalizer,
    * the JDK's implementation of the same Unicode UAX#15 spec DuckDB's
    * `nfc_normalize` follows, so results are oracle-comparable), then
    * strip non-whitespace C0 control chars + DEL (class
    * [\x00-\x08\x0b\x0e-\x1f\x7f] — vertical tab 0x0B is a STRIPPED
    * control here, because RE2's `\s` is [\t\n\f\r ] and does NOT
    * include it), then collapse ASCII whitespace runs ([\t\n\f\r ] —
    * RE2 `\s` semantics, matching the SQL
    * `regexp_replace(…, '\s+', ' ')` oracle form exactly) to one
    * space and trim the ends. Case is PRESERVED (unlike
    * [[normalizeText]], which is a dedup key, this is a cleanup pass
    * whose output feeds training).
    */
  def cleanText(u: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(
      u.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var pendingSep = false
    var any = false
    var i = 0
    val n = nfc.length
    while (i < n) {
      val c = nfc.charAt(i)
      if (c == ' ' || c == 0x09 || c == 0x0a || c == 0x0c || c == 0x0d) {
        if (any) pendingSep = true
      } else if (c >= 0x20 && c != 0x7f) {
        if (pendingSep) { sb.append(' '); pendingSep = false }
        sb.append(c)
        any = true
      } // else: non-whitespace control char — dropped
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** The same normalization [[rollingFingerprint]] hashes — lowercased,
    * whitespace runs collapsed to one space, ends trimmed — returned as
    * text, so callers needing a COLLISION-FREE content key can hash it
    * with a 128-bit digest (md5) instead of trusting the 64-bit
    * fingerprint (birthday-bound ~2^32 docs).
    */
  def normalizeText(u: UTF8String): UTF8String = {
    val s = u.toString
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSep = false
    var any = false
    var i = 0
    val n = s.length
    while (i < n) {
      val c0 = s.charAt(i)
      if (Character.isWhitespace(c0)) {
        if (any) pendingSep = true
      } else {
        if (pendingSep) { sb.append(' '); pendingSep = false }
        sb.append(Character.toLowerCase(c0))
        any = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def rollingFingerprint(u: UTF8String): Long = {
    val s = u.toString
    var h = 0xcbf29ce484222325L
    var pendingSep = false
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
    h
  }

  def minhashSig(arr: ArrayData, k: Int): UnsafeArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var s = 0
    while (s < n) {
      val bytes = arr.getUTF8String(s).getBytes
      var h = 0xCBF29CE484222325L
      var bi = 0
      while (bi < bytes.length) { h ^= (bytes(bi) & 0xFF); h *= 0x100000001B3L; bi += 1 }
      h = fmix(h)
      updateMins(mins, k, h)
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  @inline private def updateMins(mins: Array[Long], k: Int, base: Long): Unit = {
    var hi = base
    var i = 0
    while (i < k) {
      hi += 0x9E3779B97F4A7C15L
      var m = hi
      m ^= (m >>> 30); m *= 0xBF58476D1CE4E5B9L
      m ^= (m >>> 27); m *= 0x94D049BB133111EBL
      m ^= (m >>> 31)
      if (m < mins(i)) mins(i) = m
      i += 1
    }
  }

  def minhashText(u: UTF8String, shingleSize: Int, k: Int): UnsafeArrayData = {
    val s = u.toString
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
    if (m > 0 && m < shingleSize) {
      var base = 0L
      var t = 0
      while (t < m) { base = base * 0x9E3779B97F4A7C15L + tokenHashes.get(t); t += 1 }
      updateMins(mins, k, fmix(base))
    } else {
      var w = 0
      while (w + shingleSize <= m) {
        var base = 0L
        var t = w
        while (t < w + shingleSize) { base = base * 0x9E3779B97F4A7C15L + tokenHashes.get(t); t += 1 }
        updateMins(mins, k, fmix(base))
        w += 1
      }
    }
    if (m == 0) updateMins(mins, k, fmix(0L))
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  def sigAgreement(a: ArrayData, b: ArrayData): java.lang.Double = {
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

  @inline private def isJavaRegexSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isAsciiPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

  def qualityScore(u: UTF8String, stopwords: Set[String]): Double = {
    val s = u.toString
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
    if (nTokens == 0) return 0.0
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
    java.math.BigDecimal.valueOf(raw)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  def langId(u: UTF8String, en: Set[String], de: Set[String],
             fr: Set[String], es: Set[String]): UTF8String = {
    val s = u.toString
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

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** First 60 bits of md5 as an unsigned long — the fused form of the
    * id-pure digest idiom `conv(substring(md5(x), 1, 15), 16, 10)` used
    * throughout the catalog (membership sampling, sync checksums, derived
    * p-values). Value-identical to the SQL chain (15 hex chars = bytes
    * 0..6 + the high nibble of byte 7, always non-negative), but skips
    * materializing the 32-char hex string, the substring copy and the
    * base-16 string parse — one digest + 8 shifts per row.
    */
  def md5Head60(u: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(u.getBytes)
    var h = 0L
    var k = 0
    while (k < 7) { h = (h << 8) | (d(k) & 0xFFL); k += 1 }
    (h << 4) | ((d(7) & 0xF0L) >>> 4)
  }

  /** 60-bit SimHash whose word hash is the first 15 hex chars of md5 —
    * a fingerprint spec reproducible bit-for-bit in ANSI SQL
    * (`CAST('0x' || substr(md5(word),1,15) AS BIGINT)`), unlike the
    * engine-private [[simhash64]]. Tokenization mirrors Spark's
    * `split(lower(trim(text)), "\\s+")` exactly (limit -1 semantics:
    * leading/trailing separators produce empty tokens, and an empty
    * trimmed text is the single empty token).
    */
  def md5SimHash60(u: UTF8String): Long = {
    val md = md5Local.get()
    val counts = new Array[Int](60)
    val toks = u.toLowerCase.trim().toString.split("\\s+", -1)
    var t = 0
    while (t < toks.length) {
      md.reset()
      val d = md.digest(toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = bytes 0..6 + the high nibble of byte 7
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (d(k) & 0xFFL); k += 1 }
      h = (h << 4) | ((d(7) & 0xF0L) >>> 4)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Product-quantization encode: for each of the m subspaces, the id of
    * the nearest codeword (L2) to the vector's slice. `codebooks` is
    * m × k × (dim/m), rides the plan as one reference object (shared by
    * every row — the PQ hot loop is all primitive arrays, no boxing).
    */
  def pqEncode(a: ArrayData, codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val codes = new Array[Int](m)
    var s = 0
    var off = 0
    while (s < m) {
      val book = codebooks(s)
      val dsub = book(0).length
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var d = 0.0; var i = 0
        while (i < dsub) {
          val t = a.getFloat(off + i).toDouble - cw(i); d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      off += dsub
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  /** [[pqEncode]] for `array<double>` vectors — the residual path of
    * IVF-PQ (vector − centroid is double arithmetic); same hot loop.
    */
  def pqEncodeD(a: ArrayData, codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val codes = new Array[Int](m)
    var s = 0
    var off = 0
    while (s < m) {
      val book = codebooks(s)
      val dsub = book(0).length
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var d = 0.0; var i = 0
        while (i < dsub) {
          val t = a.getDouble(off + i) - cw(i); d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      off += dsub
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  /** Asymmetric-distance (ADC) score: sum over subspaces of the query's
    * precomputed lookup-table entry for this row's codeword — m array
    * reads per row instead of a dim-length dot product.
    */
  def pqAdc(codes: ArrayData, lut: Array[Array[Double]]): Double = {
    val m = codes.numElements()
    if (m != lut.length)
      throw new IllegalArgumentException(
        s"PQ code width $m != codebook count ${lut.length} — codes were " +
          "encoded with different codebooks than this query's LUT")
    var acc = 0.0
    var s = 0
    while (s < m) { acc += lut(s)(codes.getInt(s)); s += 1 }
    acc
  }

  /** Span-scrub merge walk: `sorted` is a doc's tokens as pos-ascending
    * `struct(pos int, tok string)`, `cov` its covered positions sorted
    * ascending (duplicates tolerated). One O(tokens + covered) pass
    * reassembles the kept text and counts kept/dropped — replacing a
    * per-token `array_contains` probe that is O(tokens × covered) on
    * exactly the mass-duplicated documents span dedup targets.
    * Returns `struct(text string, kept long, dropped long)`.
    */
  def spanScrub(sorted: ArrayData, cov: ArrayData): InternalRow = {
    val n = sorted.numElements()
    val nc = cov.numElements()
    val sb = new java.lang.StringBuilder
    var kept = 0L
    var dropped = 0L
    var j = 0
    var i = 0
    while (i < n) {
      val row = sorted.getStruct(i, 2)
      val pos = row.getInt(0)
      while (j < nc && cov.getInt(j) < pos) j += 1
      if (j < nc && cov.getInt(j) == pos) dropped += 1L
      else {
        if (kept > 0L) sb.append(' ')
        sb.append(row.getUTF8String(1).toString)
        kept += 1L
      }
      i += 1
    }
    InternalRow(UTF8String.fromString(sb.toString), kept, dropped)
  }

  /** Code-point frequency entropy in ONE pass: `(n_cp, n_distinct,
    * entropy_nats)` where entropy = ln(n) − (Σ_c count_c·ln count_c)/n —
    * the Shannon entropy of the document's code-point distribution, the
    * classic gibberish/boilerplate screen (natural text sits ~2.9–3.2
    * nats; runs of one character or base64 blobs fall far outside).
    * Characters are Unicode CODE POINTS (surrogate pairs count once),
    * matching `unnest(string_split(text, ''))` in ANSI engines. The
    * Σ c·ln c accumulation runs in ascending-code-point order so the
    * kernel is deterministic; cross-engine comparison is at rounded
    * precision (the q79 ln-parity precedent), not raw-double bits.
    */
  def charEntropyStats(u: UTF8String): InternalRow = {
    val s = u.toString
    val counts = new java.util.TreeMap[Integer, Array[Int]]
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
    }
    if (n == 0) return InternalRow(0, 0, 0.0)
    var slc = 0.0
    val it = counts.values.iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      slc += c * java.lang.Math.log(c)
    }
    InternalRow(n, counts.size, java.lang.Math.log(n.toDouble) - slc / n)
  }

  /** Jaro-Winkler similarity — the record-linkage string metric that
    * weights agreeing prefixes (names/titles misspell at the END far
    * more often than the start). Standard formulation (the
    * RapidFuzz/Winkler convention, which ANSI engines with a built-in
    * `jaro_winkler_similarity` follow): match window
    * `max(|a|,|b|)/2 − 1`, transpositions = half the out-of-order
    * matches, prefix bonus `ℓ·0.1·(1−jaro)` with ℓ ≤ 4 applied only
    * when jaro > 0.7. Both empty → 1; one empty → 0. Char-exact
    * (case-sensitive), UTF-16 code units (the same unit the engines
    * compare).
    */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString; val b = ub.toString
    val la = a.length; val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = java.lang.Math.max(0, java.lang.Math.max(la, lb) / 2 - 1)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = java.lang.Math.max(0, i - window)
      val hi = java.lang.Math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bm(j) && a.charAt(i) == b.charAt(j)) {
          am(i) = true; bm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of a vs matched chars of b, in order
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    // the original strcmp95 (and the engines that descend from it)
    // halves the raw mismatch count with INTEGER division — an odd
    // count floors, it does not contribute 0.5
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = java.lang.Math.min(4, java.lang.Math.min(la, lb))
    while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
