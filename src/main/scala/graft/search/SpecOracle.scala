package graft.search

import graft.analysis.Analysis
import graft.util.SmallFloat

/** Deliberately naive single-JVM analyzer + BM25 scorer (SURVEY.md §5.2):
  * a spec-faithful, independent re-statement of the reference's scoring
  * semantics ([U lucene/core/.../search/similarities/BM25Similarity.java,
  * BooleanQuery, PhraseQuery, TopScoreDocCollector]) that the
  * distributed engine must match rank- AND float-score-identically.
  * No Lucene artifact exists in the sandbox, so this oracle stands in
  * for Lucene's own regression output (see SURVEY.md §5.2 item 3).
  *
  * Deliberate mirror of the engine's conventions (both sides implement
  * the same normative spec, FIXTURES.md §3-4):
  *  - docId = rank of url in lexicographic order (zero-based)
  *  - positions = token index after analysis
  *  - clause scores summed in float32 in clause order (must, then should)
  *  - dl = SmallFloat-quantized decoded length
  */
final class SpecOracle(corpus: Seq[(String, String, String)],
                       stopWords: Set[String] = Set.empty,
                       stem: Boolean = false,
                       synonyms: Map[String, String] = Map.empty) {
  // (url, text, lang) → docId by url order
  private val docs: IndexedSeq[(Long, String, Array[String], String)] =
    corpus.sortBy(_._1).zipWithIndex.map { case ((url, text, lang), i) =>
      (i.toLong, url,
        Analysis.analyze(text, stopWords, Analysis.MaxTokenLength, stem, synonyms),
        lang)
    }.toIndexedSeq

  val docCount: Long = docs.length.toLong
  val sumTotalTermFreq: Long = docs.iterator.map(_._3.length.toLong).sum
  private val stats = Bm25Stats(docCount, sumTotalTermFreq)
  private val cache = BM25.buildCache(stats.avgdl)

  private val normOf: Map[Long, Byte] =
    docs.iterator.map(d => d._1 -> SmallFloat.intToByte4(d._3.length)).toMap

  /** term → docId → (tf, positions) */
  val postings: Map[String, Map[Long, (Int, Array[Int])]] = {
    val m = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.HashMap[Long, (Int, Array[Int])]]
    docs.foreach { case (docId, _, tokens, _) =>
      val perTerm = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.ArrayBuffer[Int]]
      tokens.zipWithIndex.foreach { case (t, p) =>
        perTerm.getOrElseUpdate(t, scala.collection.mutable.ArrayBuffer.empty) += p
      }
      perTerm.foreach { case (t, ps) =>
        m.getOrElseUpdate(t, scala.collection.mutable.HashMap.empty)
          .put(docId, (ps.length, ps.toArray))
      }
    }
    m.iterator.map { case (t, dm) => t -> dm.toMap }.toMap
  }

  def df(term: String): Long =
    postings.get(term).map(_.size.toLong).getOrElse(0L)
  def ttf(term: String): Long =
    postings.get(term).map(_.valuesIterator.map(_._1.toLong).sum).getOrElse(0L)

  private def weightOf(term: String): Float = {
    val d = df(term)
    if (d == 0) 0f else BM25.idf(docCount, d)
  }

  private def urlOf(docId: Long): String = docs(docId.toInt)._2
  private def langOf(docId: Long): String = docs(docId.toInt)._4

  /** None = no match; Some(score) = match (score 0 for pure filters). */
  def scoreDoc(q: Query, docId: Long): Option[Float] = q match {
    case TermQ(t) =>
      postings.get(t).flatMap(_.get(docId)).map { case (tf, _) =>
        BM25.score(weightOf(t), tf.toFloat, cache(normOf(docId) & 0xFF))
      }
    case PhraseQ(ts, slop) =>
      val hits = ts.map(t => postings.get(t).flatMap(_.get(docId)))
      if (hits.exists(_.isEmpty)) None
      else {
        val posLists = hits.map(_.get._2)
        val freq = posLists.head.count(p =>
          posLists.zipWithIndex.tail.forall { case (ps, i) =>
            if (slop == 0) ps.contains(p + i)
            else ps.exists(q => math.abs((q - i) - p) <= slop)
          })
        if (freq == 0) None
        else {
          var w = 0f
          ts.foreach(t => w += weightOf(t))
          Some(BM25.score(w, freq.toFloat, cache(normOf(docId) & 0xFF)))
        }
      }
    case SpanNearQ(ts, slop, inOrder) =>
      val hits = ts.map(t => postings.get(t).flatMap(_.get(docId)))
      if (hits.exists(_.isEmpty)) None
      else {
        val freq = Spans.spanFreq(hits.map(_.get._2).toIndexedSeq, slop, inOrder)
        if (freq == 0) None
        else {
          var w = 0f
          ts.foreach(t => w += weightOf(t))
          Some(BM25.score(w, freq.toFloat, cache(normOf(docId) & 0xFF)))
        }
      }
    case MatchAllQ => Some(1f)
    case MatchNoneQ => None
    case AttrQ("lang", v) => if (langOf(docId) == v) Some(0f) else None
    case AttrQ("url", v) => if (urlOf(docId) == v) Some(0f) else None
    case AttrQ(n, _) => sys.error(s"unsupported attr $n")
    case AttrRangeQ(name, lo, hi, il, ih) =>
      // lexicographic semantics on the oracle's string attributes —
      // engine timestamps/numerics are gated via the DuckDB oracle
      val v = name match {
        case "lang" => langOf(docId)
        case "url" => urlOf(docId)
        case n => sys.error(s"unsupported attr $n")
      }
      val okLo = lo.forall(l => if (il) v >= l else v > l)
      val okHi = hi.forall(h => if (ih) v <= h else v < h)
      if (okLo && okHi) Some(0f) else None
    case PredQ(i) => sys.error(s"internal PredQ($i) reached the SpecOracle")
    case DocIdSetQ(ids) =>
      if (ids.contains(docId)) Some(0f) else None
    case TermSetQ(ts, s) =>
      if (ts.exists(t => postings.get(t).exists(_.contains(docId)))) Some(s) else None
    case BoostQ(inner, b) => scoreDoc(inner, docId).map(b * _)
    case ConstScoreQ(inner, s) => scoreDoc(inner, docId).map(_ => s)
    case DisMaxQ(qs, tie) =>
      val scores = qs.flatMap(scoreDoc(_, docId))
      if (scores.isEmpty) None
      else {
        var mx = Float.NegativeInfinity
        var sm = 0f
        scores.foreach { s => if (s > mx) mx = s; sm += s }
        Some(mx + tie * (sm - mx))
      }
    case _: PrefixQ | _: WildcardQ | _: FuzzyQ | _: TermRangeQ =>
      sys.error(s"rewrite first: $q")
    case BoolQ(must, should, mustNot, filt, mm) =>
      val mustScores = must.map(scoreDoc(_, docId))
      if (mustScores.exists(_.isEmpty)) return None
      if (filt.exists(scoreDoc(_, docId).isEmpty)) return None
      if (mustNot.exists(scoreDoc(_, docId).isDefined)) return None
      val shouldScores = should.map(scoreDoc(_, docId))
      val matched = shouldScores.count(_.isDefined)
      val effMm = if (must.isEmpty && filt.isEmpty) math.max(mm, 1) else mm
      if (should.nonEmpty && matched < effMm) return None
      if (must.isEmpty && filt.isEmpty && should.isEmpty) return None
      var s = 0f
      mustScores.foreach(o => s += o.get)
      shouldScores.foreach(o => o.foreach(s += _))
      Some(s)
  }

  /** Multi-term expansion against the in-memory term dictionary. */
  def rewrite(q: Query): Query =
    Rewriter.rewrite(q, new SeqTermDict(postings.keySet.toSeq))

  /** Top-k by (score desc, docId asc) — TopScoreDocCollector semantics. */
  def topK(q0: Query, k: Int): Seq[(Int, Long, String, Float)] = {
    val q = rewrite(q0)
    docs.flatMap { case (docId, url, _, _) =>
      scoreDoc(q, docId).map(s => (docId, url, s))
    }.sortBy { case (d, _, s) => (-s, d) }
      .take(k).zipWithIndex
      .map { case ((d, u, s), i) => (i + 1, d, u, s) }
  }

  /** Two-pass reranking mirror of Searcher.rerank (ReRank semantics:
    * newScore = base + weight·rerank over the base top-N). */
  def rerankTopK(base: Query, rerankQ: Query, reRankDocs: Int,
                 weight: Float, k: Int): Seq[(Int, Long, String, Float)] = {
    val b = rewrite(base)
    val r = rewrite(rerankQ)
    val topN = docs.flatMap { case (docId, _, _, _) =>
      scoreDoc(b, docId).map(s => (docId, s))
    }.sortBy { case (d, s) => (-s, d) }.take(reRankDocs)
    topN.map { case (d, s) =>
      val rs = scoreDoc(r, d).getOrElse(0f)
      (d, s + weight * rs)
    }.sortBy { case (d, s) => (-s, d) }.take(k).zipWithIndex
      .map { case ((d, s), i) => (i + 1, d, urlOf(d), s) }
  }

  /** All matching docIds, ascending. */
  def matching(q0: Query): Seq[Long] = {
    val q = rewrite(q0)
    docs.flatMap { case (docId, _, _, _) => scoreDoc(q, docId).map(_ => docId) }
  }
}
