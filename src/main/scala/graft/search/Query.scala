package graft.search

/** Programmatic query AST — the engine-side analogue of the reference's
  * `Query` tree [U lucene/core/src/java/org/apache/lucene/search/].
  * Scoring semantics follow BooleanQuery: score = Σ MUST scores +
  * Σ matching SHOULD scores; FILTER and MUST_NOT never score
  * [U …/search/BooleanQuery.java, BooleanWeight.java]. */
sealed trait Query extends Serializable

/** Exact-term match, BM25-scored [U …/search/TermQuery.java]. */
final case class TermQ(term: String) extends Query

/** Exact phrase (slop=0): tokens adjacent in order; freq = number of
  * phrase occurrences; weight = Σ constituent idfs
  * [U …/search/PhraseQuery.java, ExactPhraseMatcher.java]. */
final case class PhraseQ(terms: Seq[String], slop: Int = 0) extends Query

/** Doc-attribute equality (e.g. lang = "en") — non-scoring, usable in
  * FILTER/MUST_NOT context; evaluated against the docs table (the
  * docvalues analogue). */
final case class AttrQ(name: String, value: String) extends Query

/** Constant-score set membership: doc contains ANY of the terms; score
  * is constant (the SQL `IN` — [U …/search/TermInSetQuery.java], and the
  * target of MultiTermQuery CONSTANT_SCORE rewrites). */
final case class TermSetQ(terms: Seq[String], score: Float = 1f) extends Query

/** Prefix match over the term dictionary
  * [U …/search/PrefixQuery.java]; rewritten to TermSetQ. */
final case class PrefixQ(prefix: String) extends Query

/** Glob wildcard (`*`, `?`) over the term dictionary
  * [U …/search/WildcardQuery.java]; rewritten to TermSetQ. */
final case class WildcardQ(pattern: String) extends Query

/** Terms within `maxEdits` Levenshtein distance
  * [U …/search/FuzzyQuery.java]; rewritten to TermSetQ. */
final case class FuzzyQ(term: String, maxEdits: Int = 2) extends Query

/** Lexicographic term range [U …/search/TermRangeQuery.java];
  * rewritten to TermSetQ. */
final case class TermRangeQ(lo: String, hi: String,
                            includeLo: Boolean = true,
                            includeHi: Boolean = true) extends Query

/** Score multiplier [U …/search/BoostQuery.java]. Engine semantics:
  * score = boost · inner score (one float multiply on the final inner
  * score — pinned; the reference folds boost into the weight, which
  * differs only in float rounding). */
final case class BoostQ(q: Query, boost: Float) extends Query

/** Fixed score for any matching doc [U …/search/ConstantScoreQuery.java]. */
final case class ConstScoreQ(q: Query, score: Float = 1f) extends Query

/** Max-of-clauses + tieBreak·(sum of the rest)
  * [U …/search/DisjunctionMaxQuery.java]. */
final case class DisMaxQ(qs: Seq[Query], tieBreak: Float = 0f) extends Query

/** Boolean combination [U …/search/BooleanQuery.java].
  * `minShouldMatch` constrains SHOULD clauses (Lucene semantics: applies
  * when should clauses are present; defaults to 1 when there are no
  * MUST/FILTER clauses, else 0). */
final case class BoolQ(
    must: Seq[Query] = Nil,
    should: Seq[Query] = Nil,
    mustNot: Seq[Query] = Nil,
    filter: Seq[Query] = Nil,
    minShouldMatch: Int = 0) extends Query

object Query {
  /** All postings terms a query touches (for stats lookup + scan prune).
    * Multi-term queries must be `rewrite`n first. */
  def collectTerms(q: Query): Seq[String] = q match {
    case TermQ(t) => Seq(t)
    case PhraseQ(ts, _) => ts
    case TermSetQ(ts, _) => ts
    case AttrQ(_, _) => Nil
    case BoostQ(inner, _) => collectTerms(inner)
    case ConstScoreQ(inner, _) => collectTerms(inner)
    case DisMaxQ(qs, _) => qs.flatMap(collectTerms).distinct
    case _: PrefixQ | _: WildcardQ | _: FuzzyQ | _: TermRangeQ =>
      sys.error(s"multi-term query not rewritten: $q — call Rewriter.rewrite first")
    case b: BoolQ =>
      (b.must ++ b.should ++ b.mustNot ++ b.filter).flatMap(collectTerms).distinct
  }

  /** Does evaluation need the docs table (attribute filters)? */
  def needsDocs(q: Query): Boolean = q match {
    case AttrQ(_, _) => true
    case BoostQ(inner, _) => needsDocs(inner)
    case ConstScoreQ(inner, _) => needsDocs(inner)
    case DisMaxQ(qs, _) => qs.exists(needsDocs)
    case b: BoolQ =>
      (b.must ++ b.should ++ b.mustNot ++ b.filter).exists(needsDocs)
    case _ => false
  }

  def and(terms: String*): Query = BoolQ(must = terms.map(TermQ.apply))
  def or(terms: String*): Query = BoolQ(should = terms.map(TermQ.apply))
  def orMM(mm: Int, terms: String*): Query =
    BoolQ(should = terms.map(TermQ.apply), minShouldMatch = mm)
  def not(pos: String, neg: String): Query =
    BoolQ(must = Seq(TermQ(pos)), mustNot = Seq(TermQ(neg)))
}
