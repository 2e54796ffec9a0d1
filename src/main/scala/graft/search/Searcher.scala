package graft.search

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.index.IndexView
import graft.model.{Block, DocRow, PostingsRow}

/** Per-query immutable context broadcast to executors: collection stats
  * + per-term global df/ttf (the `CollectionStatistics`/`TermStatistics`
  * inputs of the reference's Weight tree
  * [U lucene/core/.../search/IndexSearcher.java#createWeight]). */
final case class ScoringContext(stats: Bm25Stats,
                                termDf: Map[String, Long]) extends Serializable {
  @transient lazy val cache: Array[Float] = BM25.buildCache(stats.avgdl)
  def weightOf(term: String): Float =
    termDf.get(term).filter(_ > 0)
      .map(df => BM25.idf(stats.docCount, df)).getOrElse(0f)
}

/** Distributed top-k BM25 search over the segment tables (read path,
  * SURVEY.md §3.B): broadcast query terms + stats, per-segment scorer
  * (leapfrog / WAND with block-max skipping) emitting at most k
  * candidates per segment, then a global TakeOrdered merge — the
  * IndexSearcher → TopScoreDocCollector → TopDocs.merge chain collapsed
  * into one Spark plan [U …/search/TopScoreDocCollector.java,
  * TopDocs#merge, WANDScorer.java]. Per-segment top-k ⊇ global top-k
  * members because scores depend only on broadcast global stats. */
final class Searcher(idx: graft.index.IndexView) extends Serializable {
  private val session = idx.spark
  import session.implicits._

  private def context(q: Query): ScoringContext = {
    val terms = Query.collectTerms(q)
    val dfMap: Map[String, Long] =
      if (terms.isEmpty) Map.empty
      else idx match {
        // warm serving mode: dictionary cached on the driver — no job
        case inv: graft.index.InvertedIndex if inv.termDfMap().isDefined =>
          val m = inv.termDfMap().get
          terms.flatMap(t => m.get(t).map(t -> _)).toMap
        case _ =>
          idx.termStats.filter(col("term").isin(terms: _*))
            .select("term", "df").as[(String, Long)].collect().toMap
      }
    ScoringContext(idx.stats, dfMap)
  }

  /** Top-k hits as (rank, docId, url, score), rank-identical to the
    * reference's TopScoreDocCollector ordering (score desc, docId asc).
    *
    * Two-phase, like the reference's distributed search
    * [U solr/core/.../handler/component/QueryComponent PURPOSE_GET_TOP_IDS
    * → mergeIds → PURPOSE_GET_FIELDS]: per-segment top-k (≤ k rows per
    * segment) is collected and merged ON THE DRIVER with the same
    * comparator (TopDocs.merge), then stored fields for just the k
    * winners are fetched with a docId-pushdown scan + broadcast join —
    * no Spark-side global sort, no full docs-table scan. */
  def topK(q: Query, k: Int): DataFrame =
    rankedResult(scoredHits(q, k).collect()
      .sortBy { case (d, s) => (-s, d) }
      .take(k))

  /** Deep paging: top-k strictly AFTER a (score, docId) cursor —
    * `IndexSearcher#searchAfter` [U …/search/PagingTopScoreDocCollector]:
    * the cursor predicate is applied at heap-insert time inside every
    * segment, so page-n docs can never be crowded out by page-(n-1)
    * docs. */
  def topKAfter(q: Query, k: Int, afterScore: Float, afterDoc: Long): DataFrame = {
    val merged: Array[(Long, Float)] =
      scoredHits(q, k, Some((afterScore, afterDoc))).collect()
        .sortBy { case (d, s) => (-s, d) }
        .take(k)
    rankedResult(merged)
  }

  private def rankedResult(merged: Array[(Long, Float)]): DataFrame = {
    if (merged.isEmpty) {
      return idx.spark.emptyDataset[(Int, Long, String, Float)]
        .toDF("rank", "docId", "url", "score")
    }
    val ids = merged.map(_._1)
    // ranks assigned on the DRIVER over the already-merged ≤k hits (the
    // TopDocs.merge output) — no Window operator anywhere in the plan,
    // so no single-partition exchange even for the rank column
    val hitsDf = merged.toSeq.zipWithIndex
      .map { case ((d, s), i) => (i + 1, d, s) }
      .toDF("rank", "docId", "score")
    idx.docs.filter(col("docId").isin(ids: _*)).select("docId", "url")
      .join(broadcast(hitsDf), "docId")
      .select(col("rank"), col("docId"), col("url"), col("score"))
      .orderBy("rank")
  }

  /** All scored hits of `q`, unranked (k caps per-segment emission when
    * > 0; pass k <= 0 for exhaustive evaluation). Multi-term queries
    * are expanded against the term dictionary first (Query#rewrite). */
  def scoredHits(q0: Query, k: Int,
                 after: Option[(Float, Long)] = None): Dataset[(Long, Float)] = {
    val q = Rewriter.rewrite(q0, new IndexTermDict(idx))
    val ctx = context(q)
    val bcCtx = idx.spark.sparkContext.broadcast(ctx)
    val bcQ = idx.spark.sparkContext.broadcast(q)
    val terms = Query.collectTerms(q)
    if (terms.isEmpty && !Query.needsDocs(q)) return idx.spark.emptyDataset[(Long, Float)]
    val rows =
      if (terms.isEmpty) idx.postings.limit(0)
      else idx.postings.filter(col("term").isin(terms: _*))
    val kk = k
    // deletes are subtracted INSIDE the per-segment scorer (a deleted
    // doc must not occupy a top-k slot), via the docs cogroup path
    if (Query.needsDocs(q) || idx.hasDeletes) {
      val base = idx.docs.select(col("segId"), col("docId"), col("lang"))
      val docsLite = (if (idx.hasDeletes)
        base.join(idx.tombstones.toDF("docId").withColumn("del", lit(true)),
          Seq("docId"), "left")
          .select(col("segId"), col("docId"), col("lang"),
            coalesce(col("del"), lit(false)).as("del"))
      else base.withColumn("del", lit(false)))
        .as[(Int, Long, String, Boolean)]
      val aft = after
      rows.groupByKey(_.segId)
        .cogroup(docsLite.groupByKey(_._1)) { (segId, ps, ds) =>
          SegmentScorer.score(bcQ.value, bcCtx.value, ps, Some(ds), kk, aft)
        }
    } else {
      val aft = after
      rows.groupByKey(_.segId).flatMapGroups { (segId, ps) =>
        SegmentScorer.score(bcQ.value, bcCtx.value, ps, None, kk, aft)
      }
    }
  }
}

/** Executor-side per-segment evaluation. */
object SegmentScorer {

  /** Score one segment's postings for `q`; emits at most k hits
    * (k <= 0 → all hits). `docsIt` present only for attribute filters. */
  def score(q: Query, ctx: ScoringContext,
            postings: Iterator[PostingsRow],
            docsIt: Option[Iterator[(Int, Long, String, Boolean)]],
            k: Int,
            after: Option[(Float, Long)] = None): Iterator[(Long, Float)] = {
    // term → salt-ordered concatenated blocks
    val byTerm = mutable.HashMap.empty[String, mutable.ArrayBuffer[PostingsRow]]
    postings.foreach { r =>
      byTerm.getOrElseUpdate(r.term, mutable.ArrayBuffer.empty) += r
    }
    if (byTerm.isEmpty && docsIt.isEmpty) return Iterator.empty
    val termBlocks: Map[String, IndexedSeq[Block]] = byTerm.iterator.map {
      case (t, rows) => t -> rows.sortBy(_.salt).flatMap(_.blocks).toIndexedSeq
    }.toMap

    // attribute bitsets (lang) + deleted-docs bitset — 1 bit per seg doc
    var deleted: Option[(java.util.BitSet, Long)] = None
    val langBits: Map[String, (java.util.BitSet, Long)] = docsIt match {
      case None => Map.empty
      case Some(it) =>
        val rows = it.toArray
        if (rows.isEmpty) Map.empty
        else {
          val minDoc = rows.iterator.map(_._2).min
          val byLang = mutable.HashMap.empty[String, java.util.BitSet]
          val delBits = new java.util.BitSet()
          var anyDel = false
          rows.foreach { case (_, docId, lang, del) =>
            byLang.getOrElseUpdate(lang, new java.util.BitSet())
              .set((docId - minDoc).toInt)
            if (del) { delBits.set((docId - minDoc).toInt); anyDel = true }
          }
          if (anyDel) deleted = Some((delBits, minDoc))
          byLang.iterator.map { case (l, b) => l -> (b, minDoc) }.toMap
        }
    }
    if (byTerm.isEmpty && Query.collectTerms(q).nonEmpty) {
      // terms exist in the query but none in this segment: a pure-attr
      // query would still match; scored queries need at least one term
      if (!pureFilter(q)) return Iterator.empty
    }

    val scorer0 = compile(q, ctx, termBlocks, langBits)
    // live-docs filter: required-but-not-scoring exclusion of tombstones
    // [U …/search/ReqExclScorer + the .liv bitset]
    val scorer = deleted match {
      case Some((bits, minDoc)) =>
        new BoolScorer(IndexedSeq(scorer0), IndexedSeq.empty, IndexedSeq.empty,
          IndexedSeq(new BitsetScorer(bits, minDoc)), 0)
      case None => scorer0
    }

    // searchAfter cursor: only (s, d) strictly after the cursor qualify
    val accept: (Long, Float) => Boolean = after match {
      case None => (_, _) => true
      case Some((as, ad)) => (d, s) => s < as || (s == as && d > ad)
    }

    q match {
      case BoolQ(must, should, Nil, Nil, mm)
        if must.isEmpty && should.nonEmpty && k > 0 && deleted.isEmpty &&
          should.forall(_.isInstanceOf[TermQ]) =>
        wandTopK(should.map(s => termScorer(s.asInstanceOf[TermQ].term, ctx, termBlocks)).toIndexedSeq,
          math.max(mm, 1), k, accept)
      case TermQ(_) if k > 0 && deleted.isEmpty =>
        termTopK(scorer.asInstanceOf[TermScorer], k, accept)
      case _ => exhaustive(scorer, k, accept)
    }
  }

  private def pureFilter(q: Query): Boolean = q match {
    case AttrQ(_, _) => true
    case b: BoolQ =>
      (b.must ++ b.should ++ b.filter).forall(pureFilter) && b.mustNot.forall(pureFilter)
    case _ => false
  }

  private def termScorer(t: String, ctx: ScoringContext,
                         blocks: Map[String, IndexedSeq[Block]]): TermScorer =
    new TermScorer(blocks.getOrElse(t, IndexedSeq.empty), ctx.weightOf(t), ctx.cache)

  def compile(q: Query, ctx: ScoringContext,
              blocks: Map[String, IndexedSeq[Block]],
              langBits: Map[String, (java.util.BitSet, Long)]): DocScorer = q match {
    case TermQ(t) => termScorer(t, ctx, blocks)
    case PhraseQ(ts, slop) =>
      // weight = Σ constituent idfs, float-accumulated in phrase order
      var w = 0f
      ts.foreach(t => w += ctx.weightOf(t))
      if (ts.exists(t => !blocks.contains(t))) new EmptyScorer
      else new PhraseScorer(ts.map(t => termScorer(t, ctx, blocks)).toIndexedSeq, w, ctx.cache, slop)
    case AttrQ("lang", v) =>
      langBits.get(v) match {
        case Some((bits, minDoc)) => new BitsetScorer(bits, minDoc)
        case None => new EmptyScorer
      }
    case AttrQ(name, _) =>
      sys.error(s"unsupported attribute filter: $name")
    case TermSetQ(ts, s) =>
      new ConstScorer(new BoolScorer(IndexedSeq.empty, IndexedSeq.empty,
        ts.map(t => termScorer(t, ctx, blocks)).toIndexedSeq,
        IndexedSeq.empty, 1), s)
    case BoostQ(inner, b) =>
      new BoostScorer(compile(inner, ctx, blocks, langBits), b)
    case ConstScoreQ(inner, s) =>
      new ConstScorer(compile(inner, ctx, blocks, langBits), s)
    case DisMaxQ(qs, t) =>
      new DisMaxScorer(qs.map(compile(_, ctx, blocks, langBits)).toIndexedSeq, t)
    case _: PrefixQ | _: WildcardQ | _: FuzzyQ | _: TermRangeQ =>
      sys.error(s"multi-term query must be rewritten before compile: $q")
    case BoolQ(must, should, mustNot, filt, mm) =>
      new BoolScorer(
        must.map(compile(_, ctx, blocks, langBits)).toIndexedSeq,
        filt.map(compile(_, ctx, blocks, langBits)).toIndexedSeq,
        should.map(compile(_, ctx, blocks, langBits)).toIndexedSeq,
        mustNot.map(compile(_, ctx, blocks, langBits)).toIndexedSeq,
        mm)
  }

  /** Single-term top-k with block-max skipping: once the heap is full,
    * whole blocks whose bound can't beat the threshold are never decoded
    * [U …/search/ImpactsDISI.java]. */
  private def termTopK(ts: TermScorer, k: Int,
                       accept: (Long, Float) => Boolean): Iterator[(Long, Float)] = {
    val heap = new TopKHeap(k)
    var d = ts.nextDoc()
    while (d != Scorers.DONE) {
      val s = ts.score()
      if (accept(d, s)) heap.insert(d, s)
      d = if (heap.isFull) ts.nextCompetitive(heap.threshold) else ts.nextDoc()
    }
    heap.results().iterator
  }

  /** WAND over term disjunctions [U …/search/WANDScorer.java; Broder et
    * al. CIKM'03]: sort by current doc, pick the pivot where cumulative
    * score bounds first exceed the heap threshold, fully evaluate only
    * pivot-aligned docs. Upper bounds go through the same float kernel
    * as real scores, so pruning is exact. */
  private def wandTopK(scorers0: IndexedSeq[TermScorer], mm: Int, k: Int,
                       accept: (Long, Float) => Boolean = (_, _) => true): Iterator[(Long, Float)] = {
    val heap = new TopKHeap(k)
    val scorers = scorers0.filter(_.cost > 0).toArray
    if (scorers.length < mm || scorers.isEmpty) return Iterator.empty
    scorers.foreach(_.nextDoc())
    val byDoc = scorers.clone()
    val byDocCmp = new java.util.Comparator[TermScorer] {
      def compare(a: TermScorer, b: TermScorer): Int =
        java.lang.Long.compare(a.doc, b.doc)
    }

    while (true) {
      java.util.Arrays.sort(byDoc, byDocCmp)
      // tie-safe threshold: a candidate tying the threshold can still
      // win on docId, so pivot on bound >= threshold
      val theta = heap.threshold
      var acc = 0f
      var pivot = -1
      var i = 0
      while (pivot < 0 && i < byDoc.length) {
        acc += byDoc(i).maxScore
        if (acc >= theta && byDoc(i).doc != Scorers.DONE) pivot = i
        i += 1
      }
      if (pivot < 0) return heap.results().iterator
      val pivotDoc = byDoc(pivot).doc
      if (pivotDoc == Scorers.DONE) return heap.results().iterator
      if (byDoc(0).doc == pivotDoc) {
        // all scorers up to pivot sit on pivotDoc (or can be advanced)
        var matches = 0
        var j = 0
        while (j < scorers.length) {
          val s = scorers(j)
          if (s.doc < pivotDoc && s.doc != Scorers.DONE) s.advance(pivotDoc)
          if (s.doc == pivotDoc) matches += 1
          j += 1
        }
        if (matches >= mm) {
          // sum in ORIGINAL clause order for float determinism
          var sc = 0f
          var c = 0
          while (c < scorers.length) {
            if (scorers(c).doc == pivotDoc) sc += scorers(c).score()
            c += 1
          }
          if (accept(pivotDoc, sc)) heap.insert(pivotDoc, sc)
        }
        var j2 = 0
        while (j2 < scorers.length) {
          if (scorers(j2).doc == pivotDoc) scorers(j2).nextDoc()
          j2 += 1
        }
      } else {
        // advance the earliest scorer(s) up to the pivot doc
        var j = 0
        while (j < byDoc.length && byDoc(j).doc < pivotDoc) {
          byDoc(j).advance(pivotDoc)
          j += 1
        }
      }
    }
    heap.results().iterator // unreachable; loop exits via returns
  }

  private def exhaustive(s: DocScorer, k: Int,
                         accept: (Long, Float) => Boolean = (_, _) => true): Iterator[(Long, Float)] = {
    if (k > 0) {
      val heap = new TopKHeap(k)
      var d = s.nextDoc()
      while (d != Scorers.DONE) {
        val sc = s.score()
        if (accept(d, sc)) heap.insert(d, sc)
        d = s.nextDoc()
      }
      heap.results().iterator
    } else {
      val out = mutable.ArrayBuffer.empty[(Long, Float)]
      var d = s.nextDoc()
      while (d != Scorers.DONE) {
        out += ((d, s.score()))
        d = s.nextDoc()
      }
      out.iterator
    }
  }
}
