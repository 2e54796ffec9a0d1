package graft.search

/** Proximity-window matching shared by the engine scorer, the
  * relational path and the SpecOracle — the span/interval query family
  * [U lucene/queries/src/java/org/apache/lucene/queries/intervals/,
  * lucene/core/.../search/spans/SpanNearQuery.java; SURVEY.md §2.4 P2].
  *
  * Engine-pinned semantics (one shared implementation, so all paths
  * agree bit-for-bit): an assignment picks one position per clause;
  * it is valid when its span `max − min + 1 ≤ k + slop` and, for
  * inOrder, positions are strictly ascending in clause order.
  *
  *  - inOrder freq   = number of anchor positions p₁ of clause 1 whose
  *    GREEDY completion (each next clause takes its smallest position
  *    after the previous) yields a valid window — greedy minimizes the
  *    window end for a fixed anchor, so it finds a valid assignment iff
  *    one exists.
  *  - unordered freq = number of MINIMAL covering windows (classic
  *    sorted-merge sweep) whose span is within the limit.
  */
object Spans {

  /** Minimal ORDERED intervals of the clause list — the
    * Intervals.ordered(...) source [U lucene/queries/.../intervals/
    * OrderedIntervalsSource.java]: for each anchor position of clause 1
    * the greedy completion (each next clause takes its smallest
    * position after the previous) yields the tightest end for that
    * anchor; the minimal set keeps only intervals that contain no other
    * interval. Greedy ends are non-decreasing over ascending anchors
    * and starts are strictly increasing, so containment can only occur
    * between intervals with EQUAL ends — keep the latest anchor per
    * end. Returns (start, end) pairs, ascending. */
  def orderedIntervals(posLists: IndexedSeq[Array[Int]]): Array[(Int, Int)] = {
    val k = posLists.length
    if (k == 0 || posLists.exists(_.isEmpty)) return Array.empty
    if (k == 1) return posLists.head.map(p => (p, p))
    val raw = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val first = posLists(0)
    var a = 0
    while (a < first.length) {
      val p1 = first(a)
      var cur = p1
      var ok = true
      var i = 1
      while (ok && i < k) {
        val ps = posLists(i)
        var idx = java.util.Arrays.binarySearch(ps, cur + 1)
        if (idx < 0) idx = -idx - 1
        if (idx >= ps.length) ok = false else cur = ps(idx)
        i += 1
      }
      if (ok) raw += ((p1, cur))
      a += 1
    }
    raw.indices.iterator
      .filter(i => i == raw.length - 1 || raw(i + 1)._2 > raw(i)._2)
      .map(raw).toArray
  }

  /** MAXGAPS filter [U …/intervals/Intervals#maxgaps]: an interval of a
    * k-clause source has `width − k` gap positions; keep those with at
    * most `g`. */
  def maxgaps(intervals: Array[(Int, Int)], k: Int, g: Int): Array[(Int, Int)] =
    intervals.filter { case (s, e) => (e - s + 1) - k <= g }

  /** CONTAINING combinator [U …/intervals/Intervals#containing]: the
    * `big` intervals that contain at least one `small` interval. */
  def containing(big: Array[(Int, Int)],
                 small: Array[(Int, Int)]): Array[(Int, Int)] =
    big.filter { case (bs, be) =>
      small.exists { case (ss, se) => bs <= ss && se <= be } }

  /** WITHIN combinator [U …/intervals/Intervals#within]: the `small`
    * intervals lying inside at least one `big` interval. */
  def within(small: Array[(Int, Int)],
             big: Array[(Int, Int)]): Array[(Int, Int)] =
    small.filter { case (ss, se) =>
      big.exists { case (bs, be) => bs <= ss && se <= be } }

  /** NOT_CONTAINING [U …/intervals/Intervals#notContaining]: the `big`
    * intervals containing NO `small` interval — the set complement of
    * `containing` over the same source, by definition. */
  def notContaining(big: Array[(Int, Int)],
                    small: Array[(Int, Int)]): Array[(Int, Int)] =
    big.filter { case (bs, be) =>
      !small.exists { case (ss, se) => bs <= ss && se <= be } }

  /** NOT_WITHIN [U …/intervals/Intervals#notWithin]: the `small`
    * intervals inside NO `big` interval. */
  def notWithin(small: Array[(Int, Int)],
                big: Array[(Int, Int)]): Array[(Int, Int)] =
    small.filter { case (ss, se) =>
      !big.exists { case (bs, be) => bs <= ss && se <= be } }

  /** Generic minimality filter: keep intervals that contain no other
    * interval (the Lucene minimal-interval contract every source
    * returns). O(n²) on the per-doc interval count — small. Output
    * ascending by start (and therefore by end: a minimal set has
    * strictly ascending starts AND ends). */
  private[search] def minimalOnly(raw: Array[(Int, Int)]): Array[(Int, Int)] = {
    val d = raw.distinct
    d.filter { case (s, e) =>
      !d.exists { case (s2, e2) => (s2, e2) != ((s, e)) && s <= s2 && e2 <= e }
    }.sortBy(_._1)
  }

  /** Minimal ORDERED intervals over SUB-INTERVAL lists — the
    * generalization of `orderedIntervals` to nested sources
    * [U lucene/queries/.../intervals/OrderedIntervalsSource.java]: the
    * clauses' intervals must follow each other disjointly (next start >
    * previous end); greedy completion per anchor (each next clause
    * takes its first interval starting after the previous end — in a
    * minimal list that is also the one with the smallest end), then the
    * minimality filter. Inputs must be minimal lists (ascending starts
    * and ends), as every source here returns. */
  def orderedAlg(subs: IndexedSeq[Array[(Int, Int)]]): Array[(Int, Int)] = {
    if (subs.isEmpty || subs.exists(_.isEmpty)) return Array.empty
    if (subs.length == 1) return subs.head
    val raw = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    subs(0).foreach { case (s1, e1) =>
      var cur = e1
      var ok = true
      var i = 1
      while (ok && i < subs.length) {
        val nxt = subs(i).indexWhere(_._1 > cur)
        if (nxt < 0) ok = false else cur = subs(i)(nxt)._2
        i += 1
      }
      if (ok) raw += ((s1, cur))
    }
    minimalOnly(raw.toArray)
  }

  /** Minimal UNORDERED intervals over sub-interval lists
    * [U lucene/queries/.../intervals/UnorderedIntervalsSource.java —
    * Intervals#unordered: clauses may appear in any order and may
    * overlap]: the Lucene iterator shape — one cursor per clause,
    * candidate window = [min start, max end] over the cursors, always
    * advance the min-start clause — then the minimality filter.
    * Verified against brute-force assignment enumeration in
    * IntervalsSpec. */
  def unorderedAlg(subs: IndexedSeq[Array[(Int, Int)]]): Array[(Int, Int)] = {
    if (subs.isEmpty || subs.exists(_.isEmpty)) return Array.empty
    if (subs.length == 1) return subs.head
    val idxs = new Array[Int](subs.length)
    val raw = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var done = false
    while (!done) {
      var minS = Int.MaxValue
      var maxE = Int.MinValue
      var minC = -1
      var c = 0
      while (c < subs.length) {
        val (s, e) = subs(c)(idxs(c))
        if (s < minS) { minS = s; minC = c }
        if (e > maxE) maxE = e
        c += 1
      }
      raw += ((minS, maxE))
      idxs(minC) += 1
      if (idxs(minC) >= subs(minC).length) done = true
    }
    minimalOnly(raw.toArray)
  }

  /** OVERLAPPING combinator [U …/intervals/Intervals#overlapping]: the
    * `src` intervals overlapping at least one `ref` interval. */
  def overlapping(src: Array[(Int, Int)],
                  ref: Array[(Int, Int)]): Array[(Int, Int)] =
    src.filter { case (s, e) =>
      ref.exists { case (rs, re) => s <= re && rs <= e } }

  /** EXTENDING [U …/intervals/Intervals#extend]: each interval widened
    * by `before`/`after` positions (start clipped at 0). Lucene does
    * not re-minimalize extended intervals; neither do we. */
  def extend(src: Array[(Int, Int)], before: Int, after: Int): Array[(Int, Int)] =
    src.map { case (s, e) => (math.max(0, s - before), e + after) }

  /** Composable interval sources — the Intervals.* expression tree
    * [U lucene/queries/.../intervals/Intervals.java], evaluated per doc
    * against its term→positions map by the shared kernel above. Nested
    * sources (intervals of intervals) compose freely: every node both
    * consumes and produces minimal (start, end) lists, except EXTEND
    * (non-minimal by design, as in the reference). */
  sealed trait ISource {
    /** Terms whose PRESENCE the source requires to match — the docId
      * pre-intersection set (NOT_* reference terms are excluded: their
      * absence must not drop candidates). */
    def requiredTerms: Seq[String]
    /** Every term the evaluation reads (for position fetch). */
    def allTerms: Seq[String]
    /** Leaf-term OCCURRENCE count — the match length a gap computation
      * subtracts (duplicated terms count twice, unlike allTerms). */
    def matchLen: Int
    def eval(posOf: collection.Map[String, Array[Int]]): Array[(Int, Int)]
  }
  final case class ITerm(t: String) extends ISource {
    def matchLen: Int = 1
    def requiredTerms: Seq[String] = Seq(t)
    def allTerms: Seq[String] = Seq(t)
    def eval(posOf: collection.Map[String, Array[Int]]): Array[(Int, Int)] =
      posOf.get(t).map(_.map(p => (p, p))).getOrElse(Array.empty)
  }
  final case class IOrdered(subs: Seq[ISource]) extends ISource {
    def matchLen: Int = subs.map(_.matchLen).sum
    def requiredTerms: Seq[String] = subs.flatMap(_.requiredTerms).distinct
    def allTerms: Seq[String] = subs.flatMap(_.allTerms).distinct
    def eval(posOf: collection.Map[String, Array[Int]]): Array[(Int, Int)] =
      orderedAlg(subs.map(_.eval(posOf)).toIndexedSeq)
  }
  final case class IUnordered(subs: Seq[ISource]) extends ISource {
    def matchLen: Int = subs.map(_.matchLen).sum
    def requiredTerms: Seq[String] = subs.flatMap(_.requiredTerms).distinct
    def allTerms: Seq[String] = subs.flatMap(_.allTerms).distinct
    def eval(posOf: collection.Map[String, Array[Int]]): Array[(Int, Int)] =
      unorderedAlg(subs.map(_.eval(posOf)).toIndexedSeq)
  }
  /** gaps = width − leaf-term count (exact for ordered point sources —
    * the reference's IntervalIterator.gaps() for the same shapes). */
  final case class IMaxgaps(g: Int, sub: ISource) extends ISource {
    def matchLen: Int = sub.matchLen
    def requiredTerms: Seq[String] = sub.requiredTerms
    def allTerms: Seq[String] = sub.allTerms
    def eval(posOf: collection.Map[String, Array[Int]]): Array[(Int, Int)] =
      maxgaps(sub.eval(posOf), sub.matchLen max 1, g)
  }
  final case class IContaining(big: ISource, small: ISource) extends ISource {
    def matchLen: Int = big.matchLen
    def requiredTerms: Seq[String] = (big.requiredTerms ++ small.requiredTerms).distinct
    def allTerms: Seq[String] = (big.allTerms ++ small.allTerms).distinct
    def eval(posOf: collection.Map[String, Array[Int]]): Array[(Int, Int)] =
      containing(big.eval(posOf), small.eval(posOf))
  }
  final case class IWithin(small: ISource, big: ISource) extends ISource {
    def matchLen: Int = small.matchLen
    def requiredTerms: Seq[String] = (small.requiredTerms ++ big.requiredTerms).distinct
    def allTerms: Seq[String] = (small.allTerms ++ big.allTerms).distinct
    def eval(posOf: collection.Map[String, Array[Int]]): Array[(Int, Int)] =
      within(small.eval(posOf), big.eval(posOf))
  }
  final case class INotContaining(big: ISource, small: ISource) extends ISource {
    def matchLen: Int = big.matchLen
    def requiredTerms: Seq[String] = big.requiredTerms
    def allTerms: Seq[String] = (big.allTerms ++ small.allTerms).distinct
    def eval(posOf: collection.Map[String, Array[Int]]): Array[(Int, Int)] =
      notContaining(big.eval(posOf), small.eval(posOf))
  }
  final case class INotWithin(small: ISource, big: ISource) extends ISource {
    def matchLen: Int = small.matchLen
    def requiredTerms: Seq[String] = small.requiredTerms
    def allTerms: Seq[String] = (small.allTerms ++ big.allTerms).distinct
    def eval(posOf: collection.Map[String, Array[Int]]): Array[(Int, Int)] =
      notWithin(small.eval(posOf), big.eval(posOf))
  }
  final case class IOverlapping(src: ISource, ref: ISource) extends ISource {
    def matchLen: Int = src.matchLen
    def requiredTerms: Seq[String] = (src.requiredTerms ++ ref.requiredTerms).distinct
    def allTerms: Seq[String] = (src.allTerms ++ ref.allTerms).distinct
    def eval(posOf: collection.Map[String, Array[Int]]): Array[(Int, Int)] =
      overlapping(src.eval(posOf), ref.eval(posOf))
  }
  final case class IExtend(sub: ISource, before: Int, after: Int) extends ISource {
    def matchLen: Int = sub.matchLen
    def requiredTerms: Seq[String] = sub.requiredTerms
    def allTerms: Seq[String] = sub.allTerms
    def eval(posOf: collection.Map[String, Array[Int]]): Array[(Int, Int)] =
      extend(sub.eval(posOf), before, after)
  }

  /** freq of the near-window match; 0 = no match. Position arrays must
    * be ascending (they are: token indexes). */
  def spanFreq(posLists: IndexedSeq[Array[Int]], slop: Int,
               inOrder: Boolean): Int = {
    val k = posLists.length
    if (k == 0 || posLists.exists(_.isEmpty)) return 0
    val limit = k + slop
    if (k == 1) return posLists.head.length
    if (inOrder) {
      var freq = 0
      val first = posLists(0)
      var a = 0
      while (a < first.length) {
        val p1 = first(a)
        var cur = p1
        var ok = true
        var i = 1
        while (ok && i < k) {
          val ps = posLists(i)
          var idx = java.util.Arrays.binarySearch(ps, cur + 1)
          if (idx < 0) idx = -idx - 1
          if (idx >= ps.length) ok = false else cur = ps(idx)
          i += 1
        }
        if (ok && cur - p1 + 1 <= limit) freq += 1
        a += 1
      }
      freq
    } else {
      // merge all (pos, clause) events; sweep a window keeping one
      // position per clause; emit each minimal covering window
      val events = Array.newBuilder[(Int, Int)]
      var c = 0
      while (c < k) {
        posLists(c).foreach(p => events += ((p, c)))
        c += 1
      }
      val ev = events.result().sortBy(_._1)
      val need = new Array[Int](k)
      var covered = 0
      var freq = 0
      var left = 0
      var right = 0
      while (right < ev.length) {
        val (_, rc) = ev(right)
        if (need(rc) == 0) covered += 1
        need(rc) += 1
        while (covered == k && need(ev(left)._2) > 1) {
          need(ev(left)._2) -= 1
          left += 1
        }
        if (covered == k) {
          // minimal window [ev(left).pos, ev(right).pos]
          if (ev(right)._1 - ev(left)._1 + 1 <= limit) freq += 1
          // slide past the left anchor to search the next minimal window
          need(ev(left)._2) -= 1
          covered -= 1
          left += 1
        }
        right += 1
      }
      freq
    }
  }
}
