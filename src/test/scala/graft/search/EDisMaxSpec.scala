package graft.search

import graft.SparkSpec
import graft.SparkEntry

/** edismax dialect: parser goldens (qf/mm semantics) and execution
  * agreement with the single-field relational path. */
class EDisMaxSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val textIdx = SparkEntry.index(spark, sfDir)
  private lazy val urlIdx = SparkEntry.urlIndex(spark, sfDir)

  test("parser: occurs, dedup, percentage mm floor") {
    val p = EDisMax.parse("+Spark -merge data window data", "50%")
    assert(p.must === Seq("spark"))
    assert(p.mustNot === Seq("merge"))
    assert(p.should === Seq("data", "window")) // deduped
    assert(p.mmCount === 1) // floor(50% of 2)
    assert(EDisMax.parse("a b c", "2").mmCount === 2) // absolute
    assert(EDisMax.parse("a b c", "67%").mmCount === 2) // floor(2.01)
  }

  test("percentage mm counts the EXECUTED optional list, not raw tokens") {
    // "+spark spark merge": spark is absorbed into must, so only `merge`
    // remains optional — 100% must demand 1, not 2 (which would be
    // unsatisfiable and return nothing for docs matching both terms)
    val p = EDisMax.parse("+spark spark merge", "100%")
    assert(p.must === Seq("spark"))
    assert(p.should === Seq("merge"))
    assert(p.mmCount === 1)
    // all-duplicate should list collapses to 1 optional clause
    assert(EDisMax.parse("data data data", "100%").mmCount === 1)
  }

  test("single text field, boost 1 ≡ the single-field relational path") {
    val rel = new RelationalPath(textIdx)
    val viaEdismax = EDisMax.topK(Seq(textIdx -> 1.0),
      EDisMax.parse("spark join", "0"), 10).collect().toSeq
    val viaBool = rel.orTopK(Seq("spark", "join"), 1, 10).collect().toSeq
    assert(viaEdismax === viaBool)
  }

  test("multi-field: url-only term matches through the url index") {
    // 'src1' appears only in urls; every returned doc must have source=src1
    val hits = EDisMax.topK(Seq(textIdx -> 2.0, urlIdx -> 1.0),
      EDisMax.parse("src1", "0"), 10).collect()
    assert(hits.nonEmpty)
    val srcOf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    hits.foreach(r => assert(srcOf(r.getLong(1)) === "src1"))
  }

  test("must + mustNot across fields") {
    // +spark (text) -src1 (url): spark docs excluding source=src1
    val hits = EDisMax.topK(Seq(textIdx -> 2.0, urlIdx -> 1.0),
      EDisMax.parse("+spark -src1", "0"), 10).collect()
    assert(hits.nonEmpty)
    val srcOf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    hits.foreach(r => assert(srcOf(r.getLong(1)) !== "src1"))
  }
}
