package graft.search

import graft.SparkSpec
import graft.SparkEntry
import graft.model.Corpus

/** searchAfter pagination, highlighting, MoreLikeThis. */
class FeatureSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val idx = SparkEntry.index(spark, sfDir)
  private lazy val searcher = new Searcher(idx)
  private lazy val oracle = new SpecOracle(
    Corpus.pages(spark, sfDir).collect().toSeq.map(p => (p.url, p.text, p.lang)))

  test("searchAfter: page 2 == oracle ranks 11..20, exact scores") {
    Seq[Query](TermQ("spark"), Query.or("window", "batch")).foreach { q =>
      val page1 = searcher.topK(q, 10).collect()
      val last = page1.last
      val page2 = searcher.topKAfter(q, 10, last.getFloat(3), last.getLong(1))
        .collect().map(r => (r.getLong(1), r.getFloat(3))).toSeq
      val expected = oracle.topK(q, 20).drop(10)
        .map { case (_, d, _, s) => (d, s) }
      assert(page2 === expected, s"page2 mismatch for $q")
    }
  }

  test("highlighter: marks query terms in the best window") {
    val frag = Highlighter.bestFragment(
      "the quick spark runs a fast join over batch data", Set("spark", "join"),
      window = 6)
    assert(frag.contains("<em>spark</em>"))
    assert(frag.contains("<em>join</em>"))
    assert(Highlighter.bestFragment("nothing here", Set("spark")) === "")
  }

  test("highlighter over topK results") {
    val hits = searcher.topK(TermQ("spark"), 5)
    val pages = Corpus.pages(spark, sfDir).toDF()
    val out = Highlighter.highlightResults(hits, pages, TermQ("spark")).collect()
    assert(out.length === 5)
    out.foreach(r => assert(
      r.getString(r.fieldIndex("snippet")).contains("<em>spark</em>")))
  }

  test("MoreLikeThis: the source doc is its own best match") {
    val pages = Corpus.pages(spark, sfDir).collect()
    val p = pages.minBy(_.url)
    val q = MoreLikeThis.fromText(idx, p.text, maxTerms = 8)
    assert(q.asInstanceOf[BoolQ].should.nonEmpty)
    val top = searcher.topK(q, 5).collect()
    assert(top.nonEmpty)
    // the source doc should rank near the very top for its own profile
    assert(top.take(3).map(_.getString(2)).contains(p.url))
  }
}
