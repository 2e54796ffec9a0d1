package graft.search

import graft.analysis.Analysis

/** Lucene-syntax query-string parser (subset) → programmatic Query AST —
  * the `lucene` QParserPlugin entry point every Solr request starts from
  * [U solr/core/src/java/org/apache/solr/search/QParserPlugin.java,
  * lucene/queryparser/.../classic/QueryParser.jj]. Supported dialect:
  *
  *   term                      analyzed (lowercased) TermQ
  *   "a phrase"~slop           PhraseQ
  *   field:value               AttrQ (docs-table attribute; field `text`
  *                             or absent = the indexed body)
  *   field:[a TO b] / {a TO b} AttrRangeQ / TermRangeQ ( `*` = open end)
  *   +a -b  / AND OR NOT && || ! BooleanQuery occurs
  *   a^2.5                     BoostQ (terms, phrases, groups)
  *   pre* / w?ld / fuzzy~1     PrefixQ / WildcardQ / FuzzyQ
  *   ( … )                     grouping
  *   *:*                       MatchAllQ
  *
  * Occur semantics follow the classic parser with default operator OR:
  * bare clauses are SHOULD; AND upgrades both neighbours to MUST; NOT /
  * `-` / `!` mark the next clause MUST_NOT; `+` marks it MUST. A single
  * positive clause unwraps (BooleanQuery single-clause rewrite). */
object QueryParser {

  // ---------------- lexer ----------------

  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object Plus extends Tok
  private case object Minus extends Tok
  private case object AndT extends Tok
  private case object OrT extends Tok
  private case object NotT extends Tok
  private final case class PhraseT(field: Option[String], text: String,
                                   slop: Int, boost: Option[Float]) extends Tok
  private final case class RangeT(field: Option[String], lo: String, hi: String,
                                  il: Boolean, ih: Boolean) extends Tok
  private final case class WordT(field: Option[String], text: String,
                                 fuzzy: Option[Int], boost: Option[Float]) extends Tok
  private final case class BoostT(boost: Float) extends Tok // after `)`

  private def lex(s: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    val n = s.length
    def readNumber(): Float = {
      val st = i
      while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
      require(i > st, s"expected number at offset $st in: $s")
      s.substring(st, i).toFloat
    }
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LP; i += 1 }
      else if (c == ')') {
        i += 1
        out += RP
        if (i < n && s.charAt(i) == '^') { i += 1; out += BoostT(readNumber()) }
      }
      else if (c == '+') { out += Plus; i += 1 }
      else if (c == '-' || c == '!') { out += Minus; i += 1 }
      else {
        // field prefix?
        var field: Option[String] = None
        val fEnd = {
          var j = i
          while (j < n && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
          j
        }
        if (fEnd < n && fEnd > i && s.charAt(fEnd) == ':') {
          field = Some(s.substring(i, fEnd))
          i = fEnd + 1
        }
        if (i < n && s.charAt(i) == '"') {
          // quoted phrase
          i += 1
          val st = i
          while (i < n && s.charAt(i) != '"') i += 1
          require(i < n, s"unterminated phrase in: $s")
          val text = s.substring(st, i)
          i += 1
          var slop = 0
          var boost: Option[Float] = None
          if (i < n && s.charAt(i) == '~') { i += 1; slop = readNumber().toInt }
          if (i < n && s.charAt(i) == '^') { i += 1; boost = Some(readNumber()) }
          out += PhraseT(field, text, slop, boost)
        } else if (i < n && (s.charAt(i) == '[' || s.charAt(i) == '{')) {
          val il = s.charAt(i) == '['
          i += 1
          val st = i
          while (i < n && s.charAt(i) != ']' && s.charAt(i) != '}') i += 1
          require(i < n, s"unterminated range in: $s")
          val ih = s.charAt(i) == ']'
          val body = s.substring(st, i).trim
          i += 1
          val parts = body.split("\\s+TO\\s+")
          require(parts.length == 2, s"range must be '[lo TO hi]': $body")
          out += RangeT(field, parts(0), parts(1), il, ih)
        } else {
          val st = i
          while (i < n && !s.charAt(i).isWhitespace &&
            "()\"^~".indexOf(s.charAt(i)) < 0) i += 1
          val word = s.substring(st, i)
          require(word.nonEmpty, s"empty term at offset $st in: $s")
          var fuzzy: Option[Int] = None
          var boost: Option[Float] = None
          if (i < n && s.charAt(i) == '~') {
            i += 1
            fuzzy = Some(if (i < n && s.charAt(i).isDigit) readNumber().toInt else 2)
          }
          if (i < n && s.charAt(i) == '^') { i += 1; boost = Some(readNumber()) }
          word match {
            case "AND" | "&&" => out += AndT
            case "OR" | "||" => out += OrT
            case "NOT" => out += NotT
            case _ => out += WordT(field, word, fuzzy, boost)
          }
        }
      }
    }
    out.result()
  }

  // ---------------- parser ----------------

  private sealed trait Occur
  private case object MUST extends Occur
  private case object SHOULD extends Occur
  private case object MUST_NOT extends Occur

  def parse(s: String): Query = {
    val (q, rest) = parseClauses(lex(s))
    require(rest.isEmpty, s"dangling tokens after query: $rest")
    q
  }

  private def boosted(q: Query, b: Option[Float]): Query =
    b.map(BoostQ(q, _)).getOrElse(q)

  private def atomQuery(t: Tok): Option[Query] = t match {
    case WordT(Some("*"), "*", _, _) => Some(MatchAllQ)
    case WordT(None, "*:*", _, _) => Some(MatchAllQ)
    case WordT(Some(f), "*", _, boost) if f != "text" =>
      // field:* = FieldExistsQuery (open-open attr range)
      Some(boosted(AttrRangeQ(f, None, None), boost))
    case WordT(Some("text") | None, "*", _, boost) =>
      // every doc has a body: text-exists ≡ match-all (and never a
      // dictionary-wide PrefixQ("") expansion)
      Some(boosted(MatchAllQ, boost))
    case WordT(field, text, fuzzy, boost) =>
      val isBody = field.isEmpty || field.contains("text")
      val q =
        if (!isBody) {
          // wildcard/fuzzy markers on attr fields would otherwise parse
          // silently as literal equality (lang:e* matching nothing) —
          // reject, mirroring the explicit phrase-on-attr require below
          require(fuzzy.isEmpty && !text.exists(c => c == '*' || c == '?'),
            s"wildcard/fuzzy not supported on attribute field '${field.get}': $text")
          AttrQ(field.get, text)
        }
        else {
          val w = Analysis.lowercase(text)
          fuzzy match {
            case Some(e) => FuzzyQ(w, e)
            case None =>
              if (w.endsWith("*") && !w.dropRight(1).exists(c => c == '*' || c == '?'))
                PrefixQ(w.dropRight(1))
              else if (w.exists(c => c == '*' || c == '?')) WildcardQ(w)
              else TermQ(w)
          }
        }
      Some(boosted(q, boost))
    case PhraseT(field, text, slop, boost) =>
      require(field.isEmpty || field.contains("text"),
        s"phrases only supported on the body field")
      val terms = text.trim.split("\\s+").toSeq.map(Analysis.lowercase)
      Some(boosted(
        if (terms.length == 1) TermQ(terms.head) else PhraseQ(terms, slop), boost))
    case RangeT(field, lo, hi, il, ih) =>
      val isBody = field.isEmpty || field.contains("text")
      if (isBody) {
        val loOpt = Some(lo).filter(_ != "*").map(Analysis.lowercase)
        val hiOpt = Some(hi).filter(_ != "*").map(Analysis.lowercase)
        // [* TO *] = every doc with a body = match-all, never a
        // whole-dictionary expansion
        if (loOpt.isEmpty && hiOpt.isEmpty) Some(MatchAllQ)
        else Some(TermRangeQ(loOpt, hiOpt, il, ih))
      }
      else Some(AttrRangeQ(field.get,
        Some(lo).filter(_ != "*"), Some(hi).filter(_ != "*"), il, ih))
    case _ => None
  }

  /** Parse a clause run until RP/end; returns (query, remaining). */
  private def parseClauses(toks0: List[Tok]): (Query, List[Tok]) = {
    var toks = toks0
    val clauses = scala.collection.mutable.ArrayBuffer.empty[(Occur, Query)]
    var pendingOccur: Option[Occur] = None
    var afterAnd = false

    def push(q: Query): Unit = {
      val occ = pendingOccur.getOrElse(if (afterAnd) MUST else SHOULD)
      // AND upgrades the PREVIOUS defaulted clause too
      if (afterAnd && clauses.nonEmpty && clauses.last._1 == SHOULD)
        clauses(clauses.length - 1) = (MUST, clauses.last._2)
      clauses += ((occ, q))
      pendingOccur = None
      afterAnd = false
    }

    var done = false
    while (!done && toks.nonEmpty) {
      toks.head match {
        case RP => done = true; toks = toks.tail
        case LP =>
          val (inner, rest) = parseClauses(toks.tail)
          rest match {
            case BoostT(b) :: more => push(BoostQ(inner, b)); toks = more
            case _ => push(inner); toks = rest
          }
        case Plus => pendingOccur = Some(MUST); toks = toks.tail
        case Minus | NotT => pendingOccur = Some(MUST_NOT); toks = toks.tail
        case AndT => afterAnd = true; toks = toks.tail
        case OrT => afterAnd = false; toks = toks.tail
        case BoostT(_) => sys.error("boost without preceding group")
        case t =>
          atomQuery(t) match {
            case Some(q) => push(q); toks = toks.tail
            case None => sys.error(s"unexpected token $t")
          }
      }
    }

    // normalize duplicate clauses at PARSE time so both executors (the
    // scorer path sums every clause, the relational path aggregates per
    // term) receive the same deduped query: repeated clauses within an
    // occur collapse, and a clause that is both MUST and SHOULD scores
    // once as MUST (its SHOULD copy is redundant for matching).
    val must = clauses.collect { case (MUST, q) => q }.distinct.toSeq
    val should = clauses.collect { case (SHOULD, q) => q }.distinct
      .filterNot(must.contains).toSeq
    val mustNot = clauses.collect { case (MUST_NOT, q) => q }.distinct.toSeq
    val q =
      if (must.isEmpty && mustNot.isEmpty && should.length == 1) should.head
      else if (should.isEmpty && mustNot.isEmpty && must.length == 1) must.head
      else BoolQ(must = must, should = should, mustNot = mustNot)
    (q, toks)
  }
}
