package graft.search

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Interval-combinator kernel properties: Spans.orderedIntervals must
  * equal the brute-force minimal-interval set (all ascending
  * assignments, containment-filtered) on random position lists, and
  * the maxgaps/containing/within combinators must match their
  * set-algebra definitions. Pure Scala — no Spark session. */
class IntervalsSpec extends AnyFunSuite {

  /** Brute force: every assignment picking one position per clause in
    * strictly ascending clause order yields window (first, last); the
    * minimal set keeps windows containing no other window. */
  private def bruteMinimal(posLists: IndexedSeq[Array[Int]]): Set[(Int, Int)] = {
    if (posLists.isEmpty || posLists.exists(_.isEmpty)) return Set.empty
    var windows = Set.empty[(Int, Int)]
    def rec(i: Int, prev: Int, start: Int): Unit =
      if (i == posLists.length) windows += ((start, prev))
      else posLists(i).foreach { p =>
        if (i == 0) rec(i + 1, p, p)
        else if (p > prev) rec(i + 1, p, start)
      }
    rec(0, Int.MinValue, 0)
    windows.filter { case (s, e) =>
      !windows.exists { case (s2, e2) =>
        (s2, e2) != (s, e) && s <= s2 && e2 <= e }
    }
  }

  test("orderedIntervals == brute-force minimal intervals (randomized)") {
    val rnd = new Random(4242L)
    (1 to 300).foreach { trial =>
      val k = 1 + rnd.nextInt(3)
      val lists = IndexedSeq.fill(k) {
        val n = 1 + rnd.nextInt(6)
        Array.fill(n)(rnd.nextInt(30)).distinct.sorted
      }
      val got = Spans.orderedIntervals(lists).toSet
      val want = bruteMinimal(lists)
      assert(got === want, s"trial $trial lists=${lists.map(_.toSeq)}")
    }
  }

  test("orderedIntervals: ascending starts, non-decreasing ends, no nesting") {
    val rnd = new Random(77L)
    (1 to 100).foreach { _ =>
      val lists = IndexedSeq.fill(1 + rnd.nextInt(3)) {
        Array.fill(1 + rnd.nextInt(8))(rnd.nextInt(40)).distinct.sorted
      }
      val iv = Spans.orderedIntervals(lists)
      iv.sliding(2).foreach {
        case Array((s1, e1), (s2, e2)) =>
          assert(s1 < s2 && e1 < e2, iv.toSeq.toString)
        case _ => ()
      }
    }
  }

  /** Random minimal interval list (ascending starts and ends, no
    * nesting) — the contract every source output satisfies. */
  private def randMinimal(rnd: Random, maxLen: Int, bound: Int): Array[(Int, Int)] = {
    val raw = Array.fill(1 + rnd.nextInt(maxLen))(
      (rnd.nextInt(bound), rnd.nextInt(6))).map { case (s, w) => (s, s + w) }
    val d = raw.distinct
    d.filter { case (s, e) =>
      !d.exists { case (s2, e2) => (s2, e2) != ((s, e)) && s <= s2 && e2 <= e }
    }.sortBy(_._1)
  }

  private def minimalSet(ws: Set[(Int, Int)]): Set[(Int, Int)] =
    ws.filter { case (s, e) =>
      !ws.exists { case (s2, e2) => (s2, e2) != ((s, e)) && s <= s2 && e2 <= e } }

  test("unorderedAlg == brute-force minimal covering windows (randomized)") {
    val rnd = new Random(9090L)
    (1 to 400).foreach { trial =>
      val k = 1 + rnd.nextInt(3)
      val subs = IndexedSeq.fill(k)(randMinimal(rnd, 5, 25))
      // brute force: every assignment of one interval per clause covers
      // [min start, max end]; keep the minimal windows
      var windows = Set.empty[(Int, Int)]
      def rec(i: Int, s: Int, e: Int): Unit =
        if (i == k) windows += ((s, e))
        else subs(i).foreach { case (is, ie) =>
          rec(i + 1, math.min(s, is), math.max(e, ie)) }
      rec(0, Int.MaxValue, Int.MinValue)
      val want = minimalSet(windows)
      val got = Spans.unorderedAlg(subs).toSet
      assert(got === want, s"trial $trial subs=${subs.map(_.toSeq)}")
    }
  }

  test("orderedAlg == brute-force minimal ordered windows over sub-intervals") {
    val rnd = new Random(5151L)
    (1 to 400).foreach { trial =>
      val k = 1 + rnd.nextInt(3)
      val subs = IndexedSeq.fill(k)(randMinimal(rnd, 5, 25))
      var windows = Set.empty[(Int, Int)]
      def rec(i: Int, prevEnd: Int, start: Int): Unit =
        if (i == k) windows += ((start, prevEnd))
        else subs(i).foreach { case (is, ie) =>
          if (i == 0) rec(1, ie, is)
          else if (is > prevEnd) rec(i + 1, ie, start) }
      rec(0, Int.MinValue, 0)
      val want = minimalSet(windows)
      val got = Spans.orderedAlg(subs).toSet
      assert(got === want, s"trial $trial subs=${subs.map(_.toSeq)}")
    }
  }

  test("orderedAlg on point lists == orderedIntervals (kernel coherence)") {
    val rnd = new Random(31337L)
    (1 to 200).foreach { _ =>
      val lists = IndexedSeq.fill(1 + rnd.nextInt(3)) {
        Array.fill(1 + rnd.nextInt(6))(rnd.nextInt(30)).distinct.sorted
      }
      assert(Spans.orderedAlg(lists.map(_.map(p => (p, p)))).toSeq ===
        Spans.orderedIntervals(lists).toSeq)
    }
  }

  test("overlapping / extend combinators + nested ISource composition") {
    val iv = Array((0, 3), (10, 12))
    assert(Spans.overlapping(iv, Array((3, 5))).toSeq === Seq((0, 3)))
    assert(Spans.overlapping(iv, Array((4, 9))).toSeq === Seq.empty)
    assert(Spans.overlapping(iv, Array((12, 20))).toSeq === Seq((10, 12)))
    assert(Spans.extend(Array((1, 2), (5, 6)), 2, 1).toSeq ===
      Seq((0, 3), (3, 7))) // start clipped at 0
    // nested: ordered(unordered(a, b), c) over a positions map
    import Spans._
    val posOf = scala.collection.mutable.HashMap(
      "a" -> Array(0, 9), "b" -> Array(2, 7), "c" -> Array(4, 11))
    val un = IUnordered(Seq(ITerm("a"), ITerm("b")))
    assert(un.eval(posOf).toSeq === Seq((0, 2), (7, 9)))
    val nested = IOrdered(Seq(un, ITerm("c")))
    assert(nested.eval(posOf).toSeq === Seq((0, 2, 4), (7, 9, 11)).map {
      case (s, _, e) => (s, e) })
    // NOT_* required-terms: the reference side is not required
    assert(INotContaining(un, ITerm("zzz")).requiredTerms.toSet === Set("a", "b"))
    assert(INotContaining(un, ITerm("zzz")).eval(posOf).toSeq === un.eval(posOf).toSeq)
    // matchLen counts occurrences, not distinct terms
    assert(IOrdered(Seq(ITerm("a"), ITerm("a"))).matchLen === 2)
  }

  test("maxgaps / containing / within combinators: set-algebra definitions") {
    // clause positions: a at 0,10; b at 3,12 → ordered intervals
    // (0,3), (10,12)
    val iv = Spans.orderedIntervals(IndexedSeq(Array(0, 10), Array(3, 12)))
    assert(iv.toSeq === Seq((0, 3), (10, 12)))
    // gaps: (0,3) has width 4 − 2 = 2 gaps; (10,12) has 1
    assert(Spans.maxgaps(iv, 2, 1).toSeq === Seq((10, 12)))
    assert(Spans.maxgaps(iv, 2, 2).toSeq === Seq((0, 3), (10, 12)))
    // containing: single-position smalls
    val small = Array((2, 2), (20, 20))
    assert(Spans.containing(iv, small).toSeq === Seq((0, 3)))
    assert(Spans.within(small, iv).toSeq === Seq((2, 2)))
    // NOT variants are exact complements over the same source
    assert(Spans.notContaining(iv, small).toSeq === Seq((10, 12)))
    assert(Spans.notWithin(small, iv).toSeq === Seq((20, 20)))
    assert((Spans.containing(iv, small) ++ Spans.notContaining(iv, small))
      .sorted.toSeq === iv.sorted.toSeq)
    assert((Spans.within(small, iv) ++ Spans.notWithin(small, iv))
      .sorted.toSeq === small.sorted.toSeq)
  }
}
