package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a large-scale training-data pipeline, all
  * built from codegen'd `org.apache.spark.sql.functions` so they stay inside
  * whole-stage codegen (no Scala UDF in the hot path).
  *
  * These go beyond the reference's surface (which is numeric-only) — they are
  * the text-pipeline operators a 100 TB documents table needs.
  */
object TextFunctions {

  /** URL canonicalization for web-corpus dedup — the normalization pass
    * run before any URL-keyed dedup/frequency analysis, folding the five
    * highest-traffic cosmetic variants onto one key:
    *   1. fragment stripped (`#…` is client-side only);
    *   2. scheme + authority lowercased (case-insensitive per RFC 3986
    *      §6.2.2.1 — the PATH stays case-sensitive);
    *   3. default ports dropped (`http…:80`, `https…:443`);
    *   4. tracking parameters removed (`utm_*`, `gclid`, `fbclid`,
    *      `msclkid`, `ref`), separators re-tidied, empty query dropped;
    *   5. a single trailing slash dropped (except the bare root).
    * Pure regexp/string composition (codegen'd, one projection) and
    * reproducible in ANSI SQL — no lookarounds, so the patterns run
    * identically under Java regex and RE2. NULL in → NULL out.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val prefix = regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val rest = noFrag.substr(length(prefix) + 1, length(noFrag))
    val canonPrefix = regexp_replace(
      regexp_replace(lower(prefix), "^(http://.*):80$", "$1"),
      "^(https://.*):443$", "$1")
    val noTrack = regexp_replace(rest,
      "([?&])(utm_[^=&#]*|gclid|fbclid|msclkid|ref)=[^&#]*", "$1")
    val tidy = regexp_replace(regexp_replace(regexp_replace(
      noTrack, "&&+", "&"), "\\?&", "?"), "[?&]+$", "")
    val noSlash = regexp_replace(tidy, "^(.+)/$", "$1")
    concat(canonPrefix, noSlash)
  }

  /** HTML → text extraction (X137) — the step between a web crawl's raw
    * payloads ([[graft.sources.Warc]]) and every text operator in this
    * library. A deterministic regexp/replace chain (codegen'd, one
    * projection, reproducible bit-for-bit in RE2-based ANSI engines — no
    * backreferences or lookarounds):
    *   1. comments dropped (commented-out markup must not leak);
    *   2. `<script>`/`<style>` blocks dropped WITH their contents
    *      (separate patterns — a backreference `</\1>` would not port);
    *   3. block-level tags become newlines (paragraph structure survives
    *      for the chunkers/dedupers that split on lines);
    *   4. all remaining tags become spaces;
    *   5. the five core named entities + `&#39;`/`&nbsp;` decode,
    *      `&amp;` LAST (single-pass order: `&amp;lt;` means literal
    *      "&lt;" and must not double-decode);
    *   6. whitespace normalizes (horizontal runs → one space, spaces
    *      trimmed around newlines, newline runs → one, ends trimmed).
    * Contract: numeric character references beyond `&#39;` and the long
    * tail of named entities pass through verbatim (document-level
    * fidelity needs a real entity table; this is the deterministic
    * SQL-portable core).
    */
  def htmlToText(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComment,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val blocks = regexp_replace(noStyle,
      "(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|table|blockquote|pre|section|article|header|footer|title)\\b[^>]*>",
      "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", " ")
    val entities = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => regexp_replace(c, e, ch) }
    val hspace = regexp_replace(entities, "[ \\t\\f\\r]+", " ")
    val tidy = regexp_replace(regexp_replace(hspace, " ?\\n ?", "\n"),
      "\\n+", "\n")
    // trim() strips spaces only (both here and in ANSI engines) — edge
    // newlines need their own strip
    trim(regexp_replace(tidy, "^\\n+|\\n+$", ""))
  }

  /** The [[htmlToText]] chain as SQL text over expression `x` — kept
    * adjacent to the Column form so the two stay in lockstep (the oracle
    * of any query using htmlToText embeds this). `global = true` emits
    * the DuckDB/Postgres 4-arg `'g'` form; `false` the 3-arg form for
    * engines (Spark SQL) whose regexp_replace is global by default —
    * which is also how HtmlSpec proves the SQL text equals the Column
    * chain byte-for-byte.
    */
  def htmlToTextSql(x: String, global: Boolean = true): String = {
    def rr(inner: String, pat: String, rep: String) =
      if (global) s"regexp_replace($inner, '$pat', $rep, 'g')"
      else s"regexp_replace($inner, '$pat', $rep)"
    val noComment = rr(x, "(?s)<!--.*?-->", "' '")
    val noScript = rr(noComment, "(?is)<script[^>]*>.*?</script>", "' '")
    val noStyle = rr(noScript, "(?is)<style[^>]*>.*?</style>", "' '")
    val blocks = rr(noStyle,
      "(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|table|blockquote|pre|section|article|header|footer|title)\\b[^>]*>",
      "chr(10)")
    val noTags = rr(blocks, "(?s)<[^>]*>", "' '")
    val entities = Seq("&lt;" -> "'<'", "&gt;" -> "'>'",
      "&quot;" -> "'\"'", "&#39;" -> "''''", "&nbsp;" -> "' '",
      "&amp;" -> "'&'")
      .foldLeft(noTags) { case (c, (e, ch)) => rr(c, e, ch) }
    val hspace = rr(entities, "[ \\t\\f\\r]+", "' '")
    val tidy = rr(rr(hspace, " ?\\n ?", "chr(10)"), "\\n+", "chr(10)")
    s"trim(${rr(tidy, "^\\n+|\\n+$", "''")})"
  }

  /** Whitespace token count. NULL/empty/blank text → 0. */
  def tokenCount(text: Column): Column =
    when(text.isNull || length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Word-boundary blocklist hit test (X65): TRUE iff any whitespace
    * token of the lowercased text is in `words` — the C4 "bad words"
    * gate (Raffel et al. 2020 §2.2) and the Dolma taggers' wordlist
    * rule. Token-exact (no substring false-positives: "classic" never
    * trips on an embedded match), one `arrays_overlap` inside
    * whole-stage codegen, and reproducible in ANSI SQL via
    * `array_has_any(regexp_split_to_array(lower(trim(text)),'\s+'), …)`
    * — hence oracle-checkable (q94). NULL/blank text → false.
    */
  def blocklistHit(text: Column, words: Seq[String]): Column = {
    require(words.nonEmpty, "empty blocklist")
    when(text.isNull || length(trim(text)) === 0, lit(false))
      .otherwise(arrays_overlap(
        split(lower(trim(text)), "\\s+"),
        array(words.map(w => lit(w.toLowerCase)): _*)))
  }

  /** Word n-grams WITH repeats (unlike [[graft.operators.Dedup.shingles]],
    * which is the distinct set) — the raw material of within-document
    * repetition signals. NULL/blank text and docs shorter than n tokens →
    * empty array.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    when(text.isNull || size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Split a document into fixed-size token windows with overlap — the
    * chunking step of RAG / pretraining prep. Chunk i covers tokens
    * `[i·step, i·step + chunkSize)` with `step = chunkSize − overlap`;
    * the final chunk may be short; chunks are rejoined with single spaces
    * (tokenization is whitespace-normalized, matching [[tokenCount]]).
    * NULL/blank text → empty array. Pure column arithmetic (no UDF), so
    * the operation is a stateless single scan and ANSI-SQL reproducible.
    */
  def chunkTokens(text: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    val toks = split(trim(text), "\\s+")
    val n = size(toks)
    when(text.isNull || length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), floor((n - 1) / step).cast("int")),
        i => concat_ws(" ", slice(toks, i * step + 1, lit(chunkSize)))))
  }

  /** Content-defined chunking (X148) — the CDC alternative to
    * [[chunkTokens]]' fixed windows: a chunk boundary falls AFTER token
    * i wherever `md5(token_i ‖ ':' ‖ token_{i+1})`'s 52-bit prefix is ≡ 0
    * (mod `avgTokens`), so boundaries are functions of local CONTENT
    * alone. Insert or delete a sentence and only the chunks touching it
    * change — fixed windows shift every downstream chunk, defeating
    * chunk-level dedup/caching (the rsync/LBFS/FastCDC argument, in
    * token space where text pipelines operate).
    *
    * Returns `array<struct<chunk_id int, chunk string>>`. Expected chunk
    * length ≈ avgTokens; boundaries are id-free, so IDENTICAL text spans
    * in different documents produce identical chunk strings — that is
    * the property chunk-hash dedup needs. Pure `functions._` composition
    * (codegen'd, one projection) and reproducible in ANSI SQL.
    */
  def chunkContentDefined(text: Column, avgTokens: Int): Column = {
    require(avgTokens >= 2, s"avgTokens=$avgTokens must be >= 2")
    val toks = split(trim(text), "\\s+")
    val n = size(toks)
    // boundary flag per gap i (after token i, i in 1..n-1): ONE md5 per
    // gap, then an aggregate prefix-scan — never re-hash per position
    val flags = transform(sequence(lit(1), n - 1), i =>
      when(conv(substring(md5(concat_ws(":",
          element_at(toks, i), element_at(toks, i + 1))), 1, 13), 16, 10)
        .cast("long") % avgTokens === 0, 1).otherwise(0))
    // ids(k) = chunk id of token k = boundaries among gaps 1..k-1.
    // n = 1 has no gaps — guarded because sequence(1, 0) DESCENDS in
    // Spark rather than yielding the empty array
    val ids = when(n <= 1, array(lit(0)))
      .otherwise(aggregate(flags,
        array(lit(0)),
        (acc, f) => concat(acc, array(element_at(acc, -1) + f))))
    when(text.isNull || length(trim(text)) === 0,
        array().cast("array<struct<chunk_id:int,chunk:string>>"))
      .otherwise(
        transform(array_distinct(ids), cid =>
          struct(cid.cast("int").as("chunk_id"),
            concat_ws(" ", filter(zip_with(toks, ids,
              (t, id) => when(id === cid, t)), x => x.isNotNull))
              .as("chunk"))))
  }

  /** Gopher-style repetition signal: the duplicated fraction of a doc's
    * word trigrams, as exact integer counts (total, distinct) so
    * aggregations over it stay bit-comparable across engines. Returns a
    * struct `(n_grams, n_distinct)`.
    */
  def trigramRepetition(text: Column): Column =
    // fused one-pass kernel (expressions.TrigramStats); NULL text keeps the
    // column formulation's (0, 0) rather than propagating null
    coalesce(graft.plans.expressions.trigramStats(text),
      struct(lit(0).as("n_grams"), lit(0).as("n_distinct")))

  /** Approximate BPE-ish subword count: words plus extra tokens for long
    * words (roughly 1 token per 4 chars beyond the first 4), mirroring the
    * common chars/4 heuristic for byte-pair encoders.
    */
  def approxBpeTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(
        aggregate(
          split(trim(text), "\\s+"),
          lit(0),
          (acc, w) => acc + greatest(lit(1), ceil(length(w) / 4d).cast("int"))
        )
      )

  /** DEFLATE compression ratio `compressed_bytes / raw_utf8_bytes` — the
    * Gopher/FineWeb-style quality signal: highly repetitive or templated
    * text compresses far below ~0.4, natural prose sits higher, and
    * near-incompressible text (already-compressed or random bytes pasted
    * as text) approaches or exceeds 1 (deflate adds framing overhead).
    * Level 6 (zlib default), deterministic for a given JDK; NULL/empty →
    * NULL. Per-row JNI-free `java.util.zip.Deflater`, partition-local —
    * this is inherently per-document CPU, there is nothing to shuffle.
    * Not ANSI-replayable (no SQL deflate), so oracle coverage uses the
    * q36 bound-boolean pattern: envelope assertions the raw ratio must
    * satisfy, pinned TRUE.
    */
  def deflateRatio(text: Column): Column = {
    val f = udf((s: String) => {
      if (s == null || s.isEmpty) None
      else {
        val raw = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d = new java.util.zip.Deflater(6)
        try {
          d.setInput(raw); d.finish()
          // count output bytes only (buffer reused across deflate calls —
          // incompressible input can exceed raw.length + 64 in total)
          val buf = new Array[Byte](8192)
          var n = 0L
          while (!d.finished()) n += d.deflate(buf)
          Some(n.toDouble / raw.length)
        } finally d.end()
      }
    })
    f(text)
  }

  /** Redact common PII shapes with typed placeholders — emails, URLs, and
    * long digit runs (phone numbers, account ids, cards). Pure
    * `regexp_replace` chain: codegen'd, single pass per pattern, no UDF.
    * The pattern set is deliberately conservative (high precision); a
    * production scrub layers locale-specific patterns on top the same way.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val url = regexp_replace(email, "https?://\\S+", "<URL>")
    regexp_replace(url, "\\d{9,}", "<NUMBER>")
  }

  /** Punctuation-character ratio in [0,1]; 0 for empty text. */
  def punctRatio(text: Column): Column = {
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    when(length(text) === 0, lit(0d))
      .otherwise(punct.cast("double") / length(text))
  }

  /** Uppercase-letter ratio among letters; 0 when no letters. */
  def upperRatio(text: Column): Column = {
    val letters = length(regexp_replace(text, "[^\\p{L}]", ""))
    val uppers  = length(regexp_replace(text, "[^\\p{Lu}]", ""))
    when(letters === 0, lit(0d)).otherwise(uppers.cast("double") / letters)
  }

  val enStopwords: Seq[String] =
    Seq("the", "of", "and", "to", "in", "a", "is", "that", "it", "for",
      "on", "was", "with", "as", "be", "at", "by", "this", "are", "or")

  /** Single-pass text statistics struct (n_chars, n_tokens, n_nonspace,
    * n_punct, n_letters, n_uppers, n_stopwords, n_bpe_tokens) — one scan of
    * the string instead of five regex passes. Field semantics match the
    * regex formulations of the functions above exactly.
    */
  def textStats(text: Column): Column =
    graft.plans.expressions.textStats(text, enStopwords.toSet)

  /** Fraction of whitespace tokens that are common English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val hits = size(filter(toks, t => t.isin(enStopwords: _*)))
    when(size(toks) === 0 || length(trim(text)) === 0, lit(0d))
      .otherwise(hits.cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs, plausible
    * mean word length, presence of stopwords; penalizes punctuation spam and
    * shouting. Deterministic arithmetic only — safe for oracle comparison.
    * Computed from one [[textStats]] scan (n_tokens == 0 ⟺ blank text, so
    * the guards match the regex formulation exactly).
    */
  def qualityScore(text: Column): Column =
    when(text.isNull, lit(0d))
      .otherwise(graft.plans.expressions.qualityScore(text, enStopwords.toSet))

  /** Quality score over an already-computed [[textStats]] struct — use this
    * form when other metrics share the same stats pass.
    */
  def qualityScoreFromStats(text: Column, st: Column): Column = {
    val nTok     = st.getField("n_tokens").cast("double")
    val lenScore = least(nTok / 100d, lit(1d))
    val meanWordLen =
      when(nTok === 0, lit(0d))
        .otherwise(st.getField("n_nonspace") / nTok)
    val wordLenScore =
      when(meanWordLen >= 3d && meanWordLen <= 10d, lit(1d)).otherwise(lit(0.5d))
    val stopRatio =
      when(st.getField("n_tokens") === 0, lit(0d))
        .otherwise(st.getField("n_stopwords").cast("double") / st.getField("n_tokens"))
    val stopScore  = least(stopRatio * 4d, lit(1d))
    val pRatio =
      when(st.getField("n_chars") === 0, lit(0d))
        .otherwise(st.getField("n_punct").cast("double") / st.getField("n_chars"))
    val punctPen   = greatest(lit(0d), lit(1d) - pRatio * 4d)
    val uRatio =
      when(st.getField("n_letters") === 0, lit(0d))
        .otherwise(st.getField("n_uppers").cast("double") / st.getField("n_letters"))
    val shoutPen   = greatest(lit(0d), lit(1d) - uRatio)
    when(text.isNull || st.getField("n_tokens") === 0, lit(0d)).otherwise(
      round(
        (lenScore + wordLenScore + stopScore + punctPen + shoutPen) / 5d, 4))
  }

  /** Cheap n-gram language heuristic: scores text against tiny per-language
    * marker-token sets and returns the best label ('en','de','fr','es','und').
    * Marker lists are public high-frequency function words.
    */
  def langId(text: Column): Column =
    when(text.isNull, lit("und")).otherwise(graft.plans.expressions.langId(text,
      Set("the", "and", "of", "is", "that", "with", "for", "this"),
      Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
      Set("le", "la", "les", "et", "est", "une", "que", "pas"),
      Set("el", "los", "las", "es", "que", "una", "por", "con")))

  /** 64-bit document fingerprint via xxhash64 of normalized text (lowercased,
    * whitespace-collapsed) — the exact-dedup key at scale.
    */
  def docFingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Struct of the Flesch Reading-Ease inputs — `n_words`, `n_sentences`,
    * `n_syllables` — from a DOCUMENTED, regex-reproducible heuristic
    * (Flesch 1948 needs syllables; exact syllabification needs a
    * dictionary, so large-corpus pipelines all use a vowel-group proxy):
    *
    *  - words = whitespace tokens;
    *  - sentences = `[.!?]+` runs, floored at 1;
    *  - syllables = vowel-group runs `[aeiouy]+` in the lowercased text,
    *    minus silent-e candidates (`[consonant]e` at a word boundary),
    *    floored at the word count (≥ 1 syllable per word, applied
    *    globally so the formula stays one regex pass per term — not the
    *    per-word clamp a dictionary method would use).
    *
    * Every term is a single `regexp_extract_all` inside whole-stage
    * codegen, and each is expressible in ANSI SQL, so the score is
    * oracle-checkable (q130). NULL/blank text → NULL.
    */
  def fleschStats(text: Column): Column = {
    val lower0 = lower(trim(text))
    val nWords = size(split(trim(text), "\\s+"))
    val groups = size(regexp_extract_all(lower0, lit("[aeiouy]+"), lit(0)))
    val silentE =
      size(regexp_extract_all(lower0, lit("[b-df-hj-np-tv-z]e\\b"), lit(0)))
    val nSent =
      greatest(lit(1), size(regexp_extract_all(text, lit("[.!?]+"), lit(0))))
    when(text.isNull || length(trim(text)) === 0, lit(null))
      .otherwise(struct(
        nWords.as("n_words"),
        nSent.as("n_sentences"),
        greatest(nWords, groups - silentE).as("n_syllables")))
  }

  /** Flesch Reading-Ease score over [[fleschStats]]:
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)` —
    * high = simple prose, low/negative = dense or degenerate text; the
    * classic cheap readability gate next to [[qualityScore]].
    */
  def fleschReadingEase(text: Column): Column = {
    val st = fleschStats(text)
    when(st.isNull, lit(null)).otherwise(
      lit(206.835)
        - lit(1.015) * (st("n_words").cast("double") / st("n_sentences"))
        - lit(84.6) * (st("n_syllables").cast("double") / st("n_words")))
  }

  /** SQL-callable shims (the Column API above stays fully codegen'd; these
    * exist only so `spark.sql("SELECT TOKEN_COUNT(text) ...")` works).
    */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("TOKEN_COUNT",
      (s: String) =>
        if (s == null || s.trim.isEmpty) 0 else s.trim.split("\\s+").length)
    spark.udf.register("TOKEN_COUNT_APPROX_BPE",
      (s: String) =>
        if (s == null || s.trim.isEmpty) 0
        else s.trim.split("\\s+")
          .map(w => math.max(1, math.ceil(w.length / 4.0).toInt)).sum)
  }
}
