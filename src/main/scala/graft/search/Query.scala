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
final case class PhraseQ(terms: Seq[String]) extends Query

/** Doc-attribute equality (e.g. lang = "en") — non-scoring, usable in
  * FILTER/MUST_NOT context; evaluated against the docs table (the
  * docvalues analogue). */
final case class AttrQ(name: String, value: String) extends Query

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
  /** All postings terms a query touches (for stats lookup + scan prune). */
  def collectTerms(q: Query): Seq[String] = q match {
    case TermQ(t) => Seq(t)
    case PhraseQ(ts) => ts
    case AttrQ(_, _) => Nil
    case b: BoolQ =>
      (b.must ++ b.should ++ b.mustNot ++ b.filter).flatMap(collectTerms).distinct
  }

  /** Does evaluation need the docs table (attribute filters)? */
  def needsDocs(q: Query): Boolean = q match {
    case AttrQ(_, _) => true
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
