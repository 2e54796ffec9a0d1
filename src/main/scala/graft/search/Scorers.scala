package graft.search

import graft.model.Block
import graft.util.{PFor, VarInt}

/** Per-segment doc-at-a-time scorer tree — the analogue of the
  * reference's `Scorer`/`DocIdSetIterator` DAG
  * [U lucene/core/.../search/DocIdSetIterator.java, Scorer.java].
  * All iterators expose `nextDoc`/`advance` over ascending docIds with
  * DONE = Long.MaxValue; scores are float32 via the shared BM25 kernel.
  */
object Scorers {
  final val DONE = Long.MaxValue
}

sealed trait DocScorer {
  def doc: Long
  def nextDoc(): Long
  /** First doc >= target (assumes target > doc). */
  def advance(target: Long): Long
  def score(): Float
  /** Safe upper bound on any score this scorer can emit. */
  def maxScore: Float
  def cost: Long
}

final class EmptyScorer extends DocScorer {
  var doc: Long = Scorers.DONE
  def nextDoc(): Long = Scorers.DONE
  def advance(target: Long): Long = Scorers.DONE
  def score(): Float = 0f
  val maxScore: Float = 0f
  val cost: Long = 0L
}

/** Postings iterator + BM25 scorer for one term in one segment.
  * `blocks` is the salt-ordered concatenation of the term's block runs
  * (docId ranges of successive salt slices are disjoint and ascending by
  * construction, SURVEY.md §4.4). Block-max skipping: each block's
  * (maxTf, minNorm) gives an upper bound through the SAME float kernel
  * used for scoring, so the bound is float-monotone-safe (no ulp-level
  * false skip) [U lucene/core/.../search/ImpactsDISI.java,
  * MultiLevelSkipListWriter — the block array IS the skip list]. */
final class TermScorer(blocks: IndexedSeq[Block], val weight: Float,
                       cache: Array[Float]) extends DocScorer {
  private[this] var bi = -1
  private[this] var docsArr: Array[Long] = _
  private[this] var tfsArr: Array[Int] = _
  private[this] var normsArr: Array[Byte] = _
  private[this] var posArr: Array[Array[Int]] = _
  private[this] var i = 0
  var doc: Long = -1L

  val cost: Long = { var c = 0L; blocks.foreach(c += _.count); c }

  @inline private def bound(b: Block): Float =
    BM25.score(weight, b.maxTf.toFloat, cache(b.minNorm & 0xFF))

  val maxScore: Float = {
    var m = 0f
    blocks.foreach { b => val x = bound(b); if (x > m) m = x }
    m
  }

  private def loadBlock(n: Int): Unit = {
    bi = n
    val b = blocks(n)
    docsArr = PFor.decodeDeltas(b.docs, b.count, b.firstDocId)
    tfsArr = PFor.decodeInts(b.tfs, b.count)
    normsArr = b.norms
    posArr = null
  }

  def nextDoc(): Long = {
    if (doc == Scorers.DONE) return Scorers.DONE
    if (bi < 0) {
      if (blocks.isEmpty) { doc = Scorers.DONE; return doc }
      loadBlock(0); i = 0
    } else {
      i += 1
      if (i >= docsArr.length) {
        if (bi + 1 >= blocks.length) { doc = Scorers.DONE; return doc }
        loadBlock(bi + 1); i = 0
      }
    }
    doc = docsArr(i)
    doc
  }

  /** nextDoc that skips whole blocks whose score bound is < minScore
    * (strictly: a block tying minScore may still hold a lower-docId
    * winner, so only `<` skips). */
  def nextCompetitive(minScore: Float): Long = {
    if (doc == Scorers.DONE) return Scorers.DONE
    if (bi < 0) {
      if (blocks.isEmpty) { doc = Scorers.DONE; return doc }
      loadBlock(0); i = 0
      doc = docsArr(i)
      return doc
    }
    i += 1
    if (i >= docsArr.length) {
      var n = bi + 1
      while (n < blocks.length && bound(blocks(n)) < minScore) n += 1
      if (n >= blocks.length) { doc = Scorers.DONE; return doc }
      loadBlock(n); i = 0
    }
    doc = docsArr(i)
    doc
  }

  def advance(target: Long): Long = {
    if (doc == Scorers.DONE) return Scorers.DONE
    var n = if (bi < 0) 0 else bi
    while (n < blocks.length && blocks(n).maxDocId < target) n += 1
    if (n >= blocks.length) { doc = Scorers.DONE; return doc }
    if (n != bi) { loadBlock(n); i = 0 }
    var idx = java.util.Arrays.binarySearch(docsArr, i, docsArr.length, target)
    if (idx < 0) idx = -idx - 1
    if (idx >= docsArr.length) {
      // target fell in a gap at block end; recurse into next block
      bi = n // ensure state consistent
      if (n + 1 >= blocks.length) { doc = Scorers.DONE; return doc }
      loadBlock(n + 1); i = 0
    } else i = idx
    doc = docsArr(i)
    doc
  }

  def freq: Int = tfsArr(i)
  def normByte: Byte = normsArr(i)

  def score(): Float = BM25.score(weight, tfsArr(i).toFloat, cache(normsArr(i) & 0xFF))

  /** Positions of the current doc (decoded lazily, once per block) —
    * the two-phase verification path for phrases
    * [U …/search/TwoPhaseIterator.java]. */
  def positions(): Array[Int] = {
    if (posArr == null)
      posArr = VarInt.decodePositions(blocks(bi).positions, tfsArr)
    posArr(i)
  }
}

/** Non-scoring iterator over a per-segment bitset (attribute filters —
  * the docvalues-query analogue [U …/search/DocValuesFieldExistsQuery]). */
final class BitsetScorer(bits: java.util.BitSet, minDocId: Long) extends DocScorer {
  var doc: Long = -1L
  def nextDoc(): Long = advance(doc + 1)
  def advance(target: Long): Long = {
    val from = math.max(target - minDocId, 0L).toInt
    val n = bits.nextSetBit(from)
    doc = if (n < 0) Scorers.DONE else minDocId + n
    doc
  }
  def score(): Float = 0f
  val maxScore: Float = 0f
  def cost: Long = bits.cardinality().toLong
}

/** Non-scoring iterator over an explicit sorted docId array (the
  * reranking candidate filter — DocIdSetQ). */
final class IdSetScorer(ids: Array[Long]) extends DocScorer {
  private[this] var i = -1
  var doc: Long = -1L
  def nextDoc(): Long = {
    i += 1
    doc = if (i >= ids.length) Scorers.DONE else ids(i)
    doc
  }
  def advance(target: Long): Long = {
    var idx = java.util.Arrays.binarySearch(ids, math.max(i, 0), ids.length, target)
    if (idx < 0) idx = -idx - 1
    i = idx
    doc = if (i >= ids.length) Scorers.DONE else ids(i)
    doc
  }
  def score(): Float = 0f
  val maxScore: Float = 0f
  def cost: Long = ids.length.toLong
}

/** Exact-phrase scorer: leapfrog conjunction of the term iterators plus
  * position-adjacency verification on survivors (two-phase); freq =
  * number of phrase occurrences, scored through the BM25 kernel with
  * weight = Σ constituent idfs [U …/search/PhraseQuery.java#PhraseWeight,
  * ExactPhraseMatcher]. */
final class PhraseScorer(terms: IndexedSeq[TermScorer], val weight: Float,
                         cache: Array[Float], slop: Int = 0) extends DocScorer {
  var doc: Long = -1L
  private[this] var phraseFreq = 0
  val cost: Long = if (terms.isEmpty) 0L else terms.map(_.cost).min
  val maxScore: Float = weight // loose but safe: kernel < weight always

  private def alignAndVerify(start: Long): Long = {
    var target = start
    while (true) {
      // leapfrog all terms to a common doc
      var max = target
      terms.foreach { t =>
        val d = if (t.doc >= target) t.doc else t.advance(target)
        if (d > max) max = d
      }
      if (max == Scorers.DONE) { doc = Scorers.DONE; return doc }
      if (terms.forall(_.doc == max)) {
        phraseFreq = countPhrase()
        if (phraseFreq > 0) { doc = max; return doc }
        target = max + 1
      } else target = max
    }
    Scorers.DONE
  }

  /** slop=0: exact adjacency. slop>0 (engine-pinned semantics,
    * mirrored by the SpecOracle; the reference's SloppyPhraseMatcher
    * uses an edit-distance formulation [U …/search/SloppyPhraseMatcher]):
    * anchored at each first-term offset o0 = p0 - 0, match if every
    * term i has a position with |（p_i - i) - o0| <= slop. */
  private def countPhrase(): Int = {
    val first = terms(0).positions()
    var c = 0
    var pi = 0
    while (pi < first.length) {
      val o0 = first(pi)
      var ok = true
      var ti = 1
      while (ok && ti < terms.length) {
        val ps = terms(ti).positions()
        if (slop == 0) {
          if (java.util.Arrays.binarySearch(ps, o0 + ti) < 0) ok = false
        } else {
          var found = false
          var j = 0
          while (!found && j < ps.length) {
            val adj = ps(j) - ti
            if (adj >= o0 - slop && adj <= o0 + slop) found = true
            j += 1
          }
          if (!found) ok = false
        }
        ti += 1
      }
      if (ok) c += 1
      pi += 1
    }
    c
  }

  def nextDoc(): Long =
    if (doc == Scorers.DONE || terms.isEmpty) { doc = Scorers.DONE; doc }
    else alignAndVerify(doc + 1)

  def advance(target: Long): Long =
    if (doc == Scorers.DONE || terms.isEmpty) { doc = Scorers.DONE; doc }
    else alignAndVerify(target)

  def score(): Float =
    BM25.score(weight, phraseFreq.toFloat, cache(terms(0).normByte & 0xFF))
}

/** Span-near proximity scorer: leapfrog conjunction of the term
  * iterators, then window verification on survivors via the shared
  * Spans.spanFreq semantics (two-phase, like phrases)
  * [U lucene/core/.../search/spans/SpanNearQuery.java]. */
final class SpanNearScorer(terms: IndexedSeq[TermScorer], val weight: Float,
                           cache: Array[Float], slop: Int, inOrder: Boolean)
    extends DocScorer {
  var doc: Long = -1L
  private[this] var freq = 0
  val cost: Long = if (terms.isEmpty) 0L else terms.map(_.cost).min
  val maxScore: Float = weight // loose but safe: kernel < weight always

  private def alignAndVerify(start: Long): Long = {
    var target = start
    while (true) {
      var max = target
      terms.foreach { t =>
        val d = if (t.doc >= target) t.doc else t.advance(target)
        if (d > max) max = d
      }
      if (max == Scorers.DONE) { doc = Scorers.DONE; return doc }
      if (terms.forall(_.doc == max)) {
        freq = Spans.spanFreq(terms.map(_.positions()), slop, inOrder)
        if (freq > 0) { doc = max; return doc }
        target = max + 1
      } else target = max
    }
    Scorers.DONE
  }

  def nextDoc(): Long =
    if (doc == Scorers.DONE || terms.isEmpty) { doc = Scorers.DONE; doc }
    else alignAndVerify(doc + 1)

  def advance(target: Long): Long =
    if (doc == Scorers.DONE || terms.isEmpty) { doc = Scorers.DONE; doc }
    else alignAndVerify(target)

  def score(): Float =
    BM25.score(weight, freq.toFloat, cache(terms(0).normByte & 0xFF))
}

/** General Boolean scorer, doc-at-a-time [U …/search/BooleanWeight,
  * ConjunctionDISI (leapfrog, rarest-first), ReqExclScorer,
  * MinShouldMatchSumScorer]. Clause scores are summed in ORIGINAL clause
  * order (must order, then should order) so float addition order is
  * deterministic and matches the SpecOracle bit-for-bit. */
final class BoolScorer(
    mustS: IndexedSeq[DocScorer],      // scoring required
    filterS: IndexedSeq[DocScorer],    // non-scoring required
    optS: IndexedSeq[DocScorer],       // should
    exclS: IndexedSeq[DocScorer],      // must_not
    minShouldMatch: Int) extends DocScorer {

  private[this] val required: IndexedSeq[DocScorer] =
    (mustS ++ filterS).sortBy(_.cost)
  private[this] val mm =
    if (required.isEmpty) math.max(minShouldMatch, 1) else minShouldMatch
  var doc: Long = -1L

  val cost: Long =
    if (required.nonEmpty) required.map(_.cost).min
    else optS.map(_.cost).sum

  val maxScore: Float = {
    // float sum of member bounds, accumulated in clause order
    var s = 0f
    mustS.foreach(s += _.maxScore)
    optS.foreach(s += _.maxScore)
    s
  }

  private def excluded(d: Long): Boolean = {
    var i = 0
    while (i < exclS.length) {
      val e = exclS(i)
      if (e.doc < d) e.advance(d)
      if (e.doc == d) return true
      i += 1
    }
    false
  }

  private def optionalMatches(d: Long): Int = {
    var c = 0
    var i = 0
    while (i < optS.length) {
      val o = optS(i)
      if (o.doc != Scorers.DONE) {
        if (o.doc < d) o.advance(d)
        if (o.doc == d) c += 1
      }
      i += 1
    }
    c
  }

  private def accept(d: Long): Boolean = {
    if (excluded(d)) return false
    if (optS.nonEmpty || required.isEmpty) {
      if (optionalMatches(d) < mm) return false
    }
    true
  }

  private def doNextRequired(start: Long): Long = {
    // leapfrog: lead with the rarest required clause
    var target = start
    while (true) {
      var max = target
      var i = 0
      var aligned = true
      while (i < required.length) {
        val r = required(i)
        val d = if (r.doc >= target) r.doc else r.advance(target)
        if (d == Scorers.DONE) { doc = Scorers.DONE; return doc }
        if (d > max) { max = d; aligned = false }
        i += 1
      }
      if (aligned && required.forall(_.doc == max)) {
        if (accept(max)) { doc = max; return doc }
        target = max + 1
      } else target = max
    }
    Scorers.DONE
  }

  private def doNextDisjunction(start: Long): Long = {
    var target = start
    while (true) {
      // find minimum current doc >= target among optionals
      var min = Scorers.DONE
      var i = 0
      while (i < optS.length) {
        val o = optS(i)
        if (o.doc != Scorers.DONE) {
          if (o.doc < target) o.advance(target)
          if (o.doc < min) min = o.doc
        }
        i += 1
      }
      if (min == Scorers.DONE) { doc = Scorers.DONE; return doc }
      if (accept(min)) { doc = min; return doc }
      target = min + 1
    }
    Scorers.DONE
  }

  def nextDoc(): Long = advance(doc + 1)

  def advance(target: Long): Long =
    if (doc == Scorers.DONE) doc
    else if (required.nonEmpty) doNextRequired(target)
    else doNextDisjunction(target)

  def score(): Float = {
    var s = 0f
    var i = 0
    while (i < mustS.length) { s += mustS(i).score(); i += 1 }
    i = 0
    while (i < optS.length) {
      val o = optS(i)
      if (o.doc == doc) s += o.score()
      i += 1
    }
    s
  }
}

/** Fixed score for every match [U …/search/ConstantScoreQuery.java];
  * also the execution of TermSetQ (CONSTANT_SCORE multi-term rewrite). */
final class ConstScorer(inner: DocScorer, constScore: Float) extends DocScorer {
  def doc: Long = inner.doc
  def nextDoc(): Long = inner.nextDoc()
  def advance(target: Long): Long = inner.advance(target)
  def score(): Float = constScore
  val maxScore: Float = constScore
  def cost: Long = inner.cost
}

/** Score multiplier [U …/search/BoostQuery.java] — engine semantics:
  * one float multiply on the inner score (see BoostQ). */
final class BoostScorer(inner: DocScorer, boost: Float) extends DocScorer {
  def doc: Long = inner.doc
  def nextDoc(): Long = inner.nextDoc()
  def advance(target: Long): Long = inner.advance(target)
  def score(): Float = boost * inner.score()
  val maxScore: Float = boost * inner.maxScore
  def cost: Long = inner.cost
}

/** max + tieBreak·(sum − max) over matching clauses, accumulated in
  * clause order [U …/search/DisjunctionMaxQuery.java, DisjunctionMaxScorer]. */
final class DisMaxScorer(clauses: IndexedSeq[DocScorer], tieBreak: Float)
    extends DocScorer {
  var doc: Long = -1L
  val cost: Long = clauses.map(_.cost).sum
  val maxScore: Float = {
    var mx = 0f
    var sm = 0f
    clauses.foreach { c => val m = c.maxScore; if (m > mx) mx = m; sm += m }
    mx + tieBreak * (sm - mx)
  }

  def nextDoc(): Long = advance(doc + 1)

  def advance(target: Long): Long = {
    if (doc == Scorers.DONE) return doc
    var min = Scorers.DONE
    var i = 0
    while (i < clauses.length) {
      val c = clauses(i)
      if (c.doc != Scorers.DONE) {
        if (c.doc < target) c.advance(target)
        if (c.doc < min) min = c.doc
      }
      i += 1
    }
    doc = min
    doc
  }

  def score(): Float = {
    var mx = Float.NegativeInfinity
    var sm = 0f
    var i = 0
    while (i < clauses.length) {
      val c = clauses(i)
      if (c.doc == doc) {
        val s = c.score()
        if (s > mx) mx = s
        sm += s
      }
      i += 1
    }
    mx + tieBreak * (sm - mx)
  }
}

/** Bounded top-k priority queue with Lucene's tie semantics: keep the k
  * best by (score desc, docId asc)
  * [U …/search/TopScoreDocCollector.java, HitQueue.java].
  * Min-heap ordered by (score asc, docId desc) so the root is the
  * weakest current hit. */
final class TopKHeap(k: Int) {
  private[this] val scores = new Array[Float](k)
  private[this] val docs = new Array[Long](k)
  private[this] var n = 0

  def size: Int = n
  def isFull: Boolean = n == k

  /** Current competitive threshold: scores strictly below can never
    * enter; equal scores compete on docId. */
  def threshold: Float = if (n < k) Float.NegativeInfinity else scores(0)

  @inline private def worse(s1: Float, d1: Long, s2: Float, d2: Long): Boolean =
    s1 < s2 || (s1 == s2 && d1 > d2)

  def insert(docId: Long, score: Float): Boolean = {
    if (n < k) {
      scores(n) = score; docs(n) = docId
      n += 1
      var i = n - 1
      while (i > 0 && worse(scores(i), docs(i), scores((i - 1) / 2), docs((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
      true
    } else if (worse(scores(0), docs(0), score, docId)) {
      scores(0) = score; docs(0) = docId
      siftDown()
      true
    } else false
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val td = docs(a); docs(a) = docs(b); docs(b) = td
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < n && worse(scores(l), docs(l), scores(m), docs(m))) m = l
      if (r < n && worse(scores(r), docs(r), scores(m), docs(m))) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  /** Results sorted best-first: (score desc, docId asc). */
  def results(): Array[(Long, Float)] = {
    val out = Array.tabulate(n)(i => (docs(i), scores(i)))
    out.sortBy { case (d, s) => (-s, d) }
  }
}
