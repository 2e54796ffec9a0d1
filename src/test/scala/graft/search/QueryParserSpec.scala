package graft.search

import graft.{SparkEntry, SparkSpec}
import graft.model.Corpus

/** Golden tests for the lucene-dialect query-string parser, plus
  * end-to-end identity: the scorer path answers a parsed string exactly
  * like its hand-built AST twin. */
class QueryParserSpec extends SparkSpec {

  private def p(s: String): Query = QueryParser.parse(s)

  test("terms, occurs and boolean operators") {
    assert(p("spark") === TermQ("spark"))
    assert(p("Spark") === TermQ("spark")) // analyzed (lowercased)
    assert(p("spark join") ===
      BoolQ(should = Seq(TermQ("spark"), TermQ("join"))))
    assert(p("spark AND join") ===
      BoolQ(must = Seq(TermQ("spark"), TermQ("join"))))
    assert(p("spark && join") ===
      BoolQ(must = Seq(TermQ("spark"), TermQ("join"))))
    assert(p("spark OR join") ===
      BoolQ(should = Seq(TermQ("spark"), TermQ("join"))))
    assert(p("+spark -merge") ===
      BoolQ(must = Seq(TermQ("spark")), mustNot = Seq(TermQ("merge"))))
    assert(p("spark NOT merge") ===
      BoolQ(should = Seq(TermQ("spark")), mustNot = Seq(TermQ("merge"))))
    assert(p("spark AND NOT merge") ===
      BoolQ(must = Seq(TermQ("spark")), mustNot = Seq(TermQ("merge"))))
  }

  test("phrases, boosts, slop") {
    assert(p("\"big data\"") === PhraseQ(Seq("big", "data"), 0))
    assert(p("\"big data\"~2") === PhraseQ(Seq("big", "data"), 2))
    assert(p("spark^2.5") === BoostQ(TermQ("spark"), 2.5f))
    assert(p("\"big data\"^1.5") === BoostQ(PhraseQ(Seq("big", "data"), 0), 1.5f))
  }

  test("fields, ranges, match-all") {
    assert(p("lang:en") === AttrQ("lang", "en"))
    assert(p("text:spark") === TermQ("spark"))
    assert(p("*:*") === MatchAllQ)
    assert(p("[batch TO data]") === TermRangeQ("batch", "data", true, true))
    assert(p("{batch TO data}") === TermRangeQ("batch", "data", false, false))
    assert(p("ts:[2025-01-01 TO *]") ===
      AttrRangeQ("ts", Some("2025-01-01"), None, true, true))
    assert(p("dl:[3 TO 9}") === AttrRangeQ("dl", Some("3"), Some("9"), true, false))
    assert(p("lang:*") === AttrRangeQ("lang", None, None)) // FieldExistsQuery
    assert(p("text:*") === MatchAllQ) // every doc has a body
    assert(p("[batch TO *]") === TermRangeQ(Some("batch"), None, true, true))
    assert(p("[* TO data}") === TermRangeQ(None, Some("data"), true, false))
  }

  test("multi-term suffixes: prefix, wildcard, fuzzy") {
    assert(p("spa*") === PrefixQ("spa"))
    assert(p("sp?rk") === WildcardQ("sp?rk"))
    assert(p("*dow") === WildcardQ("*dow"))
    assert(p("spork~1") === FuzzyQ("spork", 1))
    assert(p("spork~") === FuzzyQ("spork", 2)) // default edits
  }

  test("grouping and nesting") {
    assert(p("(window OR batch) AND spark") ===
      BoolQ(must = Seq(
        BoolQ(should = Seq(TermQ("window"), TermQ("batch"))),
        TermQ("spark"))))
    assert(p("(spark join)^2") ===
      BoostQ(BoolQ(should = Seq(TermQ("spark"), TermQ("join"))), 2f))
    assert(p("+lang:en (spark OR merge)") ===
      BoolQ(must = Seq(AttrQ("lang", "en")),
        should = Seq(BoolQ(should = Seq(TermQ("spark"), TermQ("merge"))))))
  }

  test("attr-only boolean agrees between relational and scorer paths") {
    val sfDir = "/root/testdata/sf0.001"
    val idx = SparkEntry.index(spark, sfDir)
    val rel = new RelationalPath(idx)
    val relIds = rel.forParsed(p("+lang:en -spark"), 10)
      .collect().map(_.getLong(1)).toSeq
    assert(relIds.nonEmpty)
    val urlOf = idx.docs.collect().map(d => d.docId -> d.url).toMap
    val scorerIds = new Searcher(idx)
      .topK(BoolQ(must = Seq(AttrQ("lang", "en")),
        mustNot = Seq(TermQ("spark"))), 10)
      .collect().map(_.getLong(1))
      .map(d => urlOf(d).substring(urlOf(d).lastIndexOf('/') + 1).toLong).toSeq
    assert(relIds === scorerIds)
    // open-ended body range expands (does not silently match nothing)
    assert(new Searcher(idx).topK(p("[window TO *]"), 10).count() > 0)
  }

  test("parsed string ≡ hand-built AST through the scorer path") {
    val sfDir = "/root/testdata/sf0.001"
    val idx = SparkEntry.index(spark, sfDir)
    val searcher = new Searcher(idx)
    val pairs: Seq[(String, Query)] = Seq(
      "spark AND join" -> Query.and("spark", "join"),
      "window OR batch" -> Query.or("window", "batch"),
      "+spark -merge" -> Query.not("spark", "merge"),
      "\"batch batch\"" -> PhraseQ(Seq("batch", "batch")),
      "spa*" -> PrefixQ("spa"),
      "*:*" -> MatchAllQ)
    pairs.foreach { case (s, ast) =>
      val a = searcher.topK(p(s), 10).collect().map(r => (r.getInt(0), r.getLong(1), r.getFloat(3))).toSeq
      val b = searcher.topK(ast, 10).collect().map(r => (r.getInt(0), r.getLong(1), r.getFloat(3))).toSeq
      assert(a === b, s"parse($s)")
    }
  }
}
