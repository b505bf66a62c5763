package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All built-in
  * expression trees (split/transform/filter/aggregate) — codegen-friendly,
  * no UDFs, fully distributed.
  *
  * Extension scope beyond the reference (SURVEY.md §7.1 step 10); laws are
  * deliberately SQL-expressible so each has a DuckDB oracle.
  */
object TextFns {

  /** Whitespace tokens of trimmed text; blank → empty array. Regex-trim, not
    * `trim`: SQL trim strips only spaces, and a trailing tab/newline would
    * leave a phantom empty token (Spark's split keeps trailing empties).
    */
  def tokens(c: Column): Column = {
    val t = regexp_replace(c, "^\\s+|\\s+$", "")
    when(t === "" || c.isNull, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  def tokenCount(c: Column): Column = size(tokens(c)).cast("bigint")

  // precompiled patterns for [[tokensScala]]: String.replaceAll/split
  // recompile their regex on EVERY call, and the object-boundary
  // operators call this once per document (r19 optimization round,
  // guide §1.2 per-task work; same patterns, same law)
  private val wsEdges = java.util.regex.Pattern.compile("^\\s+|\\s+$")
  private val wsRun = java.util.regex.Pattern.compile("\\s+")

  /** Scala twin of [[tokens]] (same law) for object-boundary operators. */
  def tokensScala(s: String): Array[String] = {
    if (s == null) return Array.empty
    val t = wsEdges.matcher(s).replaceAll("")
    if (t.isEmpty) Array.empty else wsRun.split(t)
  }

  /** Count of sentence-punctuation characters. */
  def punctCount(c: Column): Column =
    length(regexp_replace(c, "[^.!?,;:]", "")).cast("bigint")

  /** U+FFFD replacement characters — the universal decode-failure marker
    * (every charset transcoder emits it for unmappable bytes), so its
    * count IS the mojibake screen a web-crawl ingest runs before text
    * reaches training. Length-difference law (chars, not bytes) so the
    * count replays in any engine; NULL text counts 0.
    */
  def replacementCharCount(c: Column): Column =
    coalesce((length(c) - length(regexp_replace(c, "�", "")))
      .cast("bigint"), lit(0L))

  /** C0/DEL control characters excluding \t \n \r (the legitimate three)
    * — binary-in-text contamination: PDF/zip fragments, terminal escapes,
    * NUL-padded records. Same length-difference law as
    * [[replacementCharCount]].
    */
  def controlCharCount(c: Column): Column =
    coalesce((length(c) - length(regexp_replace(c,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""))).cast("bigint"), lit(0L))

  /** BPE-ish subword count: tokens split further at letter/digit boundaries
    * and every 4 chars — a cheap, deterministic proxy for BPE token counts
    * (real tokenizers are model-specific; this gives a stable budget signal).
    */
  def subwordCount(c: Column): Column =
    aggregate(
      tokens(c), lit(0L),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0).cast("long"))

  /** English stopwords used by the quality heuristic. */
  val enStopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in", "is", "it", "that", "for")
  val deStopwords: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit")
  val frStopwords: Seq[String] = Seq("le", "la", "les", "et", "est", "un", "une", "dans")
  val esStopwords: Seq[String] = Seq("el", "los", "las", "y", "es", "un", "una", "en")

  private def stopwordHits(c: Column, words: Seq[String]): Column =
    size(filter(tokens(lower(c)), t => t.isInCollection(words))).cast("bigint")

  def stopwordCount(c: Column): Column = stopwordHits(c, enStopwords)

  /** Deterministic quality score in [0,1]: stopword ratio (0.4) + length
    * saturation at 100 tokens (0.3) + punctuation sparsity (0.3). Single
    * formula, fixed operation order — bit-identical across engines.
    */
  def qualityScore(c: Column): Column = {
    val n = tokenCount(c).cast("double")
    val sw = stopwordCount(c).cast("double")
    val punct = punctCount(c).cast("double")
    val nChars = length(c).cast("double")
    when(n === 0, lit(0.0)).otherwise(
      (sw / n) * 0.4 + least(n / 100.0, lit(1.0)) * 0.3 +
        (lit(1.0) - least(punct / greatest(nChars, lit(1.0)), lit(1.0))) * 0.3)
  }

  /** Rule-based language ID: CJK charset → zh; else argmax of per-language
    * stopword hits with deterministic tie order en > de > es > fr; no hits →
    * 'und' (undetermined). Strict-inequality cascade == fixed tie preference.
    */
  def langId(c: Column): Column = {
    val en = stopwordHits(c, enStopwords)
    val de = stopwordHits(c, deStopwords)
    val es = stopwordHits(c, esStopwords)
    val fr = stopwordHits(c, frStopwords)
    when(c.rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh"))
      .when(en === 0 && de === 0 && es === 0 && fr === 0, lit("und"))
      .when(en >= de && en >= es && en >= fr, lit("en"))
      .when(de >= es && de >= fr, lit("de"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))
  }

  /** One-row text statistics — the one-pass Scala twin of the column laws
    * ([[tokenCount]]/[[subwordCount]]/[[punctCount]]/[[stopwordCount]]/
    * [[qualityScore]]), produced by a single tokenization. Operation order in
    * the double-valued quality formula is kept identical to the expression
    * form so results are bit-equal (verified by TextFnsSpec twin test).
    */
  final case class TextStats(nTokens: Long, nSubwords: Long, nPunct: Long,
      nStopwords: Long, quality: Double)

  private val enStopSet = enStopwords.toSet

  /** Scala twin of the per-document stats laws; see [[TextStats]].
    *
    * COST MODEL: the expression forms above re-run the token pipeline once
    * per consuming expression — Catalyst HOFs are interpreted and
    * CollapseProject/constraint-inference duplicate them freely (the
    * measured trap documented at Dedup.shingleHashFrame). One Scala pass
    * per row behind an object boundary tokenizes exactly once and runs
    * narrow; use [[statsFrame]] / the quality-filter form in Registry for
    * anything per-row and hot.
    */
  def statsScala(text: String): TextStats = {
    val s = if (text == null) "" else text
    val toks = tokensScala(s)
    val n = toks.length.toLong
    var subw = 0L
    var sw = 0L
    toks.foreach { t =>
      // ceil(codePoints/4): integer form of ceil(length(t)/4.0)
      val cp = t.codePointCount(0, t.length)
      subw += (cp + 3) / 4
      if (enStopSet(t.toLowerCase(java.util.Locale.ROOT))) sw += 1
    }
    var punct = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.' || c == '!' || c == '?' || c == ',' || c == ';' || c == ':') punct += 1
      i += 1
    }
    val nChars = s.codePointCount(0, s.length).toDouble
    val quality =
      if (n == 0) 0.0
      else (sw.toDouble / n.toDouble) * 0.4 +
        math.min(n.toDouble / 100.0, 1.0) * 0.3 +
        (1.0 - math.min(punct.toDouble / math.max(nChars, 1.0), 1.0)) * 0.3
    TextStats(n, subw, punct, sw, quality)
  }

  /** Intra-document repetition: (total word-3-gram positions, distinct
    * 3-grams, repetition ratio = 1 - distinct/total; 0.0 when no 3-grams).
    * High ratios flag boilerplate/templated/spammy documents — a standard
    * quality gate next to [[statsScala]]. One tokenization pass; 3-grams
    * compared as joined strings (the law the SQL oracle replicates — no
    * hashing, so no collision caveat).
    */
  def repetitionScala(text: String): (Long, Long, Double) = {
    val toks = tokensScala(text)
    val total = math.max(toks.length - 2, 0).toLong
    if (total == 0) return (0L, 0L, 0.0)
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length - 2) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    val distinct = seen.size.toLong
    (total, distinct, 1.0 - distinct.toDouble / total.toDouble)
  }

  /** Per-document Gopher-rule quality signals. All fields are exact
    * integer ratios rendered as one double division each — no libm —
    * so the SQL oracle is bit-equal. See [[gopherScala]].
    */
  final case class GopherStats(nTokens: Long, nLines: Long,
    dupLineFrac: Double, dupLineCharFrac: Double,
    top2CharFrac: Double, top3CharFrac: Double,
    meanWordLen: Double, alphaWordFrac: Double, gopherPass: Boolean)

  /** Code-POINT string order — identical to binary UTF-8 byte order, the
    * collation SQL engines apply to `ORDER BY` on varchar. Java's
    * `String.compareTo` is UTF-16 code-UNIT order instead, which ranks
    * supplementary-plane characters (surrogate units 0xD800-DFFF) BELOW
    * U+E000..FFFF — the two disagree exactly when an emoji/CJK-extension
    * string ties against one in that range, so every tie law that must
    * match a SQL oracle goes through this comparator.
    */
  private[graft] def codePointLess(a: String, b: String): Boolean = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    a.length - i < b.length - j
  }

  /** Gopher-style repetition and word-shape quality rules (Rae et al.
    * 2021, arXiv:2112.11446, Table A1 subset) — the standard web-scale
    * pretraining filter family next to [[statsScala]]'s composite score:
    *
    *  - duplicate-line fraction `1 − distinct/total` over raw
    *    `split('\n', -1)` lines (empty text is one empty line — the SQL
    *    `string_split` law);
    *  - duplicate-line CHARACTER fraction: code points in occurrences
    *    beyond each line's first, over all line code points;
    *  - top word-2-gram / 3-gram character coverage: occurrences × gram
    *    code points over text code points, most-frequent gram with ties
    *    to the lexicographically smaller;
    *  - mean word length (code points) and the fraction of tokens
    *    containing an ASCII letter.
    *
    * `gopherPass` applies the published thresholds expressible from these
    * signals: 50 ≤ tokens ≤ 100000, 3 ≤ mean word length ≤ 10,
    * duplicate-line fraction ≤ 0.30, top-2-gram coverage ≤ 0.20, alpha
    * fraction ≥ 0.80. Every comparison runs on doubles both engines
    * computed identically, so the boolean is oracle-stable too.
    *
    * One pass per document behind an object boundary (the
    * [[repetitionScala]] cost-model discipline).
    */
  def gopherScala(text: String): GopherStats = {
    val s = if (text == null) "" else text
    def cp(x: String): Long = x.codePointCount(0, x.length).toLong
    val toks = tokensScala(s)
    val n = toks.length.toLong

    var sumTokChars = 0L; var nAlpha = 0L
    toks.foreach { t =>
      sumTokChars += cp(t)
      var has = false; var i = 0
      while (!has && i < t.length) {
        val c = t.charAt(i)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) has = true
        i += 1
      }
      if (has) nAlpha += 1
    }

    val lines = s.split("\n", -1)
    val nLines = lines.length.toLong
    val lineCounts = new java.util.HashMap[String, Long]()
    lines.foreach(l => lineCounts.merge(l, 1L, _ + _))
    var dupLineChars = 0L; var lineChars = 0L
    lineCounts.forEach { (l, cnt) =>
      val len = cp(l)
      dupLineChars += (cnt - 1) * len
      lineChars += cnt * len
    }
    val dupLineFrac = 1.0 - lineCounts.size.toDouble / nLines.toDouble
    val dupLineCharFrac =
      if (lineChars == 0) 0.0 else dupLineChars.toDouble / lineChars.toDouble

    val textChars = cp(s)
    def topGramCharFrac(g: Int): Double = {
      if (toks.length < g || textChars == 0) return 0.0
      val counts = new java.util.HashMap[String, Long]()
      var i = 0
      while (i <= toks.length - g) {
        counts.merge(toks.slice(i, i + g).mkString(" "), 1L, _ + _)
        i += 1
      }
      var bestGram: String = null; var bestCnt = 0L
      counts.forEach { (gram, cnt) =>
        if (cnt > bestCnt || (cnt == bestCnt &&
            (bestGram == null || codePointLess(gram, bestGram)))) {
          bestGram = gram; bestCnt = cnt
        }
      }
      // min: occurrences of a self-overlapping gram ("w w" in "w w w")
      // jointly count shared characters more than once, so the raw ratio
      // can exceed 1 — cap to keep the value an honest coverage fraction
      math.min(1.0, (bestCnt * cp(bestGram)).toDouble / textChars.toDouble)
    }
    val top2 = topGramCharFrac(2)
    val top3 = topGramCharFrac(3)

    val meanWordLen = if (n == 0) 0.0 else sumTokChars.toDouble / n.toDouble
    val alphaWordFrac = if (n == 0) 0.0 else nAlpha.toDouble / n.toDouble
    val pass = n >= 50 && n <= 100000 &&
      meanWordLen >= 3.0 && meanWordLen <= 10.0 &&
      dupLineFrac <= 0.30 && top2 <= 0.20 && alphaWordFrac >= 0.80
    GopherStats(n, nLines, dupLineFrac, dupLineCharFrac, top2, top3,
      meanWordLen, alphaWordFrac, pass)
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key for documents.
    */
  final case class C4Stats(nLines: Long, nKept: Long, nSentences: Long,
    hasLorem: Boolean, hasBrace: Boolean, c4Keep: Boolean, cleanText: String)

  /** C4-style line-level cleaning (Raffel et al. 2020, arXiv:1910.10683
    * §2.2 — the published heuristics behind the C4 web corpus), the
    * deterministic subset expressible without an external blocklist:
    *
    *  - a line is RETAINED iff it ends in a terminal punctuation mark
    *    (`.` `!` `?` `"` — the paper's rule), carries at least 3 words
    *    (the [[tokensScala]] whitespace law), and does not mention
    *    `javascript` (case-insensitive — the paper's cookie-warning
    *    rule); `cleanText` is the retained lines re-joined with `\n`;
    *  - document flags: `lorem ipsum` anywhere (placeholder text) and
    *    `{` anywhere (code page), both over the RAW text;
    *  - `c4Keep` = neither flag ∧ the cleaned text holds ≥ 5 sentences,
    *    where `nSentences` counts `.` `!` `?` characters in the CLEANED
    *    text (the paper drops pages under 5 sentences; counting terminal
    *    marks post-clean is this library's deterministic rendering of
    *    that rule).
    *
    * Skipped on purpose: the three-sentence-span dedup (a CORPUS-level
    * operation — [[graft.ops.Dedup.stripDuplicatedSpans]] owns it) and
    * the bad-words blocklist (an external artifact, not a law). One pass
    * per document behind an object boundary ([[statsScala]] cost model);
    * every law mirrors to SQL string/list functions verbatim.
    */
  def c4Scala(text: String): C4Stats = {
    val s = if (text == null) "" else text
    val lines = s.split("\n", -1)
    val kept = lines.filter { l =>
      val endOk = l.nonEmpty && {
        val c = l.charAt(l.length - 1)
        c == '.' || c == '!' || c == '?' || c == '"'
      }
      endOk && tokensScala(l).length >= 3 &&
        !l.toLowerCase(java.util.Locale.ROOT).contains("javascript")
    }
    val clean = kept.mkString("\n")
    var nSent = 0L
    var i = 0
    while (i < clean.length) {
      val c = clean.charAt(i)
      if (c == '.' || c == '!' || c == '?') nSent += 1
      i += 1
    }
    val hasLorem = s.toLowerCase(java.util.Locale.ROOT).contains("lorem ipsum")
    val hasBrace = s.indexOf('{') >= 0
    C4Stats(lines.length.toLong, kept.length.toLong, nSent, hasLorem, hasBrace,
      !hasLorem && !hasBrace && nSent >= 5, clean)
  }

  /** Character-diversity signal via the Simpson index over code points:
    * `(n, Σc², 1 − Σc²/n²)` where `c` counts each distinct code point —
    * near 1 for diverse prose, exactly 0 for one-character spam (filter
    * LOW values to drop spam). The two
    * integer sums make the law CROSS-ENGINE EXACT (no logs): both engines
    * derive the double from the same two BIGINTs with one multiply and
    * one divide in the same order, so even the double hash-matches —
    * the reason this diversity form was chosen over Shannon entropy,
    * whose per-term `log2` is not bit-identical across libms. Code
    * points, not UTF-16 units, to match SQL `length`/`substr` semantics.
    */
  def simpsonScala(text: String): (Long, Long, Double) = {
    val s = if (text == null) "" else text
    val counts = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, _ + _)
      n += 1
      i += Character.charCount(cp)
    }
    var sumC2 = 0L
    counts.forEach((_, c) => sumC2 += c * c)
    val simpson =
      if (n == 0) 0.0
      else 1.0 - sumC2.toDouble / (n.toDouble * n.toDouble)
    (n, sumC2, simpson)
  }

  def fingerprintMd5(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** Lowercase-hex rendering of a digest — THE hash-witness encoding every
    * JVM-side md5 law shares with SQL `md5()` (unsigned byte order ==
    * lexicographic hex order). One definition so the oracle-critical
    * casing/format can never drift between operators.
    */
  def hexBytes(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length * 2)
    var i = 0
    while (i < b.length) {
      sb.append(Character.forDigit((b(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(b(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Case-preserving token-stream md5 fingerprint: md5 of the space-joined
    * token array. Complements [[fingerprintMd5]], which lowercases (so
    * case-variant copies collide there but not here); both collapse
    * whitespace and preserve token order. Unlike [[rollingHash]] it has an
    * exact DuckDB analog (`md5(array_to_string(tokens, ' '))`) —
    * oracle-comparable.
    */
  def orderedFingerprintMd5(c: Column): Column =
    md5(concat_ws(" ", tokens(c)))

  /** 64-bit rolling hash over tokens: fold acc = xxhash64(acc, token).
    * Hash-chaining rather than polynomial arithmetic — wrapping multiplies
    * would throw under ANSI mode; chaining keeps the same order-sensitivity
    * (distinguishes permuted documents, unlike [[fingerprintMd5]]'s
    * normalized form). Engine-side law (xxhash64 has no DuckDB analog) —
    * validated by unit test, not oracle.
    */
  def rollingHash(c: Column): Column =
    aggregate(tokens(c), lit(0L), (acc, t) => xxhash64(acc, t))

  /** Word n-gram shingles (distinct), the unit of Jaccard similarity:
    * e.g. n=3: ["a b c", "b c d", ...]. Empty when fewer than n tokens.
    */
  def shingles(c: Column, n: Int): Column = {
    val t = tokens(c)
    array_distinct(
      when(size(t) < n, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), size(t) - n),
          i => concat_ws(" ", slice(t, i + 1, lit(n))))))
  }

  /** Distinct 64-bit hashes of word n-gram shingles from a BOUND token-array
    * column — the working form for dedup at scale: hashing token tuples
    * directly skips building one shingle STRING per position, and downstream
    * set ops compare longs. xxhash64 is length-prefixed per field, so
    * ("a","bc") and ("ab","c") hash apart; collisions (~|shingles|²/2⁶⁴) are
    * negligible against count-based Jaccard.
    *
    * COST MODEL: `t` must be a materialized column, not an expression —
    * inside interpreted HOF lambdas every `element_at(t, …)` re-evaluates
    * the whole argument tree, so an inlined tokens() pipeline here runs
    * 3×|positions| regexp splits per row (measured 4× slowdown end-to-end).
    * Callers stage `tokens()` into a column behind an exchange first.
    */
  def shingleHashesFromTokens(t: Column, n: Int): Column =
    array_distinct(
      when(size(t) < n, array().cast("array<bigint>"))
        .otherwise(transform(
          sequence(lit(0), size(t) - n),
          i => xxhash64((1 to n).map(o => element_at(t, i + o)): _*))))

  /** Convenience inline form (tests, small data) — see the cost note above. */
  def shingleHashes(c: Column, n: Int): Column =
    shingleHashesFromTokens(tokens(c), n)

  /** Scala twin of the [[langId]] cascade over a PRE-LOWERED token window
    * — the per-window form for code-switching detection, where the
    * expression tree can't reach (windows live inside an object pass).
    * `hasCjk` is the caller's CJK witness (CJK code points have no case,
    * so lowered tokens carry them unchanged). Same cascade order as the
    * expression: zh → und → en → de → es → fr.
    */
  def langIdCascade(lowToks: Array[String], hasCjk: Boolean): String = {
    if (hasCjk) return "zh"
    var en = 0; var de = 0; var es = 0; var fr = 0
    lowToks.foreach { t =>
      if (enStopSet.contains(t)) en += 1
      if (deStopSet.contains(t)) de += 1
      if (esStopSet.contains(t)) es += 1
      if (frStopSet.contains(t)) fr += 1
    }
    if (en == 0 && de == 0 && es == 0 && fr == 0) "und"
    else if (en >= de && en >= es && en >= fr) "en"
    else if (de >= es && de >= fr) "de"
    else if (es >= fr) "es"
    else "fr"
  }

  private val deStopSet = deStopwords.toSet
  private val esStopSet = esStopwords.toSet
  private val frStopSet = frStopwords.toSet

  /** Any CJK-unified-ideograph code point (the [[langId]] regex law). */
  def hasCjkScala(s: String): Boolean = {
    if (s == null) return false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) return true
      i += 1
    }
    false
  }

  final case class FleschStats(nWords: Long, nSentences: Long,
    nSyllables: Long, flesch: Double, fkGrade: Double)

  /** Flesch reading-ease + Flesch–Kincaid grade (Flesch 1948; Kincaid et
    * al. 1975) — the classic readability quality filter, from three exact
    * integer counts:
    *
    *  - words: the shared [[tokensScala]] law;
    *  - sentences: maximal runs of `[.!?]` (the SQL
    *    `regexp_extract_all('[.!?]+')` law); a wordful document with no
    *    terminal punctuation scores as ONE sentence (the formulas divide
    *    by sentences — the raw run count is still reported);
    *  - syllables: per word, vowel-GROUP count (`[aeiouyAEIOUY]+` runs —
    *    case-insensitive by enumeration, so NO case mapping sits between
    *    the engines) floored at 1 — the standard deterministic heuristic
    *    (real syllabification is dictionary-bound; this is the
    *    [[subwordCount]] stable-proxy posture, documented, not hidden).
    *
    * flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    * and fk = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59,
    * each evaluated left-to-right on both engines from the same exact
    * integer ratios, so the doubles hash-match. Zero-word documents score
    * (0, runs, 0, 0.0, 0.0).
    */
  def fleschScala(text: String): FleschStats = {
    val s = if (text == null) "" else text
    val toks = tokensScala(s)
    val nWords = toks.length.toLong
    var nSent = 0L
    var i = 0; var inRun = false
    while (i < s.length) {
      val c = s.charAt(i)
      val isTerm = c == '.' || c == '!' || c == '?'
      if (isTerm && !inRun) nSent += 1
      inRun = isTerm
      i += 1
    }
    var nSyll = 0L
    toks.foreach { w =>
      var runs = 0L
      var j = 0; var inV = false
      while (j < w.length) {
        val c = w.charAt(j)
        val isV = c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y' ||
          c == 'A' || c == 'E' || c == 'I' || c == 'O' || c == 'U' || c == 'Y'
        if (isV && !inV) runs += 1
        inV = isV
        j += 1
      }
      nSyll += math.max(1L, runs)
    }
    if (nWords == 0L) FleschStats(0L, nSent, 0L, 0.0, 0.0)
    else {
      val sentEff = math.max(1L, nSent)
      val wps = nWords.toDouble / sentEff.toDouble
      val spw = nSyll.toDouble / nWords.toDouble
      FleschStats(nWords, nSent, nSyll,
        206.835 - 1.015 * wps - 84.6 * spw,
        0.39 * wps + 11.8 * spw - 15.59)
    }
  }

  /** Number of HTML tags in the raw text (`<[^>]+>` occurrences — opening,
    * closing, self-closing, and tags inside script/style blocks all
    * count). The cheap "is this crawl output or prose" witness.
    */
  def htmlTagCount(c: Column): Column =
    size(regexp_extract_all(c, lit("<[^>]+>"), lit(0))).cast("bigint")

  /** HTML → text stripping for crawl cleaning — the step every web-corpus
    * pipeline runs before quality/dedup (C4 and CCNet both consume
    * pre-extracted text; this is that extractor for markup-bearing rows,
    * a no-op on prose). Pure codegen'd expression chain, no UDF, and every
    * regex lives in the Java∩RE2 dialect subset (the [[graft.ops.Scrub]]
    * discipline) so the DuckDB oracle replays it verbatim:
    *
    *  1. drop comments, then `<script>`/`<style>` elements WITH their
    *     contents (case-insensitive, dot-matches-newline, non-greedy;
    *     an unclosed element leaves its content for step 2's tag strip —
    *     same on both engines),
    *  2. replace every remaining `<[^>]+>` tag with a space (block
    *     boundaries must not glue words),
    *  3. decode the six ubiquitous entities — `&nbsp;` → space first,
    *     `&amp;` LAST so freshly decoded `&` can't cascade into a second
    *     decode,
    *  4. collapse `[ \t\r\n\f]+` runs to one space and trim the ends.
    */
  def htmlStrip(c: Column): Column = {
    val noComment = regexp_replace(c, "(?is)<!--.*?-->", " ")
    val noScript = regexp_replace(noComment,
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val ent = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'",
      "&amp;" -> "&"
    ).foldLeft(noTags) { case (col0, (from, to)) =>
      call_function("replace", col0, lit(from), lit(to))
    }
    regexp_replace(regexp_replace(ent, "[ \\t\\r\\n\\f]+", " "), "^ +| +$", "")
  }

  /** Deflate compression ratio of a document's UTF-8 bytes — the classic
    * cheap redundancy signal (Gopher's repetition family and C4-era spam
    * screens both lean on "machine-generated text compresses too well"):
    * templated/looped content lands well under natural prose, random
    * noise lands near (or above) 1. Level-6 zlib via `java.util.zip`
    * (JDK-built-in, no dependency). The exact byte count is an
    * IMPLEMENTATION constant of the zlib build, not a cross-engine law —
    * so consumers treat the ratio as a monotone signal (unit-pinned
    * orderings, Verify floor gate), never an oracle-hashed value.
    *
    * Returns (rawBytes, deflateBytes, ratio); NULL text → (0, 0, NaN kept
    * out by the caller's guard — here (0,0,0.0) so aggregates stay sane).
    */
  def deflateScala(text: String): (Long, Long, Double) = {
    if (text == null || text.isEmpty) (0L, 0L, 0.0)
    else {
      val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val d = new java.util.zip.Deflater(6)
      try {
        d.setInput(raw)
        d.finish()
        val buf = new Array[Byte](raw.length + 64)
        var out = 0L
        while (!d.finished()) out += d.deflate(buf)
        (raw.length.toLong, out, out.toDouble / raw.length.toDouble)
      } finally d.end()
    }
  }
}
