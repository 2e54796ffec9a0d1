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
