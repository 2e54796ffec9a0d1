package graft.analysis

import com.ibm.icu.text.{BreakIterator, RuleBasedBreakIterator}
import com.ibm.icu.util.ULocale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Analysis chain: html→text extraction, UAX#29 word tokenization,
  * lowercasing, stop filtering (SURVEY.md §2.2).
  *
  * Tokenization re-creates the behavior of the reference's
  * `StandardTokenizer` (JFlex UAX#29 word-break grammar, maxTokenLength
  * 255) [U lucene/core/.../analysis/standard/StandardTokenizer.java]
  * using ICU4J's UAX#29 word BreakIterator (icu4j ships with Spark).
  * Lowercase + stop filtering are applied with Spark BUILT-IN array
  * functions (codegen'd), not UDFs; only the tokenizer itself is a UDF
  * (it is build-time only — per-doc, not per-query).
  */
object Analysis {

  /** Classic 33-word English stop set
    * [U lucene/analysis/common/.../en/EnglishAnalyzer.ENGLISH_STOP_WORDS_SET].
    * NOTE: Lucene 8.x `StandardAnalyzer()` defaults to an EMPTY stop set;
    * the default index config follows that (so hot terms like "the" are
    * indexed and exercise the skew path), and this set is available as an
    * opt-in StopFilter config. */
  val EnglishStopWords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with")

  val MaxTokenLength = 255

  // ICU BreakIterator is stateful and not thread-safe → one per thread.
  private val wordBreaker = new ThreadLocal[RuleBasedBreakIterator] {
    override def initialValue(): RuleBasedBreakIterator =
      BreakIterator.getWordInstance(ULocale.ROOT).asInstanceOf[RuleBasedBreakIterator]
  }

  /** UAX#29 word tokenization: emit boundary-delimited segments whose
    * rule status is a word class (letters, numbers, ideographs, kana) —
    * i.e. drop whitespace/punctuation runs — truncated at maxLen chars,
    * matching StandardTokenizer's maxTokenLength contract. */
  def tokenizeRaw(text: String, maxLen: Int = MaxTokenLength): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val bi = wordBreaker.get()
    bi.setText(text)
    val out = Array.newBuilder[String]
    var start = bi.first()
    var end = bi.next()
    while (end != BreakIterator.DONE) {
      if (bi.getRuleStatus != BreakIterator.WORD_NONE) {
        val t = text.substring(start, end)
        out += (if (t.length > maxLen) t.substring(0, maxLen) else t)
      }
      start = end
      end = bi.next()
    }
    out.result()
  }

  /** Full analyzer used by the in-memory SpecOracle and tests — must
    * stay semantically identical to the Column pipeline below. */
  def analyze(text: String, stop: Set[String] = Set.empty,
              maxLen: Int = MaxTokenLength): Array[String] = {
    val lowered = tokenizeRaw(text, maxLen).map(lowercase)
    if (stop.isEmpty) lowered else lowered.filterNot(stop)
  }

  /** Locale-independent lowercase, as the reference's LowerCaseFilter
    * (Character-based, not default-locale)
    * [U lucene/analysis/common/.../core/LowerCaseFilter.java]. */
  def lowercase(s: String): String = s.toLowerCase(java.util.Locale.ROOT)

  // ---------- Column-level API ----------

  private val tokenizeUdf =
    udf((text: String) => tokenizeRaw(text, MaxTokenLength))

  /** text → array<string> raw tokens (UAX#29). */
  def tokenize(text: Column): Column = tokenizeUdf(text)

  /** Lowercase each token — built-in higher-order function (codegen). */
  def lowercaseAll(tokens: Column): Column = transform(tokens, t => lower(t))

  /** Remove stop words — built-in `filter` + array_contains (codegen). */
  def stopFilter(tokens: Column, stop: Seq[String]): Column =
    if (stop.isEmpty) tokens
    else filter(tokens, t => !array_contains(lit(stop.toArray), t))

  /** The full analyzer as a Column: tokenize|lowercase|stop. */
  def analyzeCol(text: Column, stop: Seq[String] = Seq.empty): Column =
    stopFilter(lowercaseAll(tokenize(text)), stop)

  // ---------- html → text ----------

  /** Deterministic text extraction from the corpus html wrapper.
    * The reference path is HTMLStripCharFilter
    * [U lucene/analysis/common/.../charfilter/HTMLStripCharFilter.java];
    * our corpus generator (FIXTURES.md §1) wraps `text` invertibly in
    * `<p>…</p>`, and BASELINE.json:15 requires `extractText(html)` to be
    * BYTE-IDENTICAL to `text`. We strip tags generically: the payload is
    * everything between tags, which for the generated wrapper is exactly
    * the title + body text; we return the <p> body payload. */
  def extractText(html: Array[Byte]): String = {
    if (html == null) return null
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val open = s.indexOf("<p>")
    if (open < 0) return stripTags(s)
    val close = s.lastIndexOf("</p>")
    if (close < open) return stripTags(s)
    s.substring(open + 3, close)
  }

  /** Generic fallback: drop everything inside <...>. */
  private def stripTags(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var inTag = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') inTag = true
      else if (c == '>') inTag = false
      else if (!inTag) sb.append(c)
      i += 1
    }
    sb.toString
  }

  private val extractTextUdf = udf((html: Array[Byte]) => extractText(html))

  def extractTextCol(html: Column): Column = extractTextUdf(html)
}
