package graft.analysis

import graft.SparkSpec
import graft.model.Corpus
import org.apache.spark.sql.functions._

/** Analyzer golden tests (FIXTURES.md §2) + the extracted-text
  * byte-identity invariant (BASELINE.json:15). */
class AnalysisSpec extends SparkSpec {

  private val stop = Analysis.EnglishStopWords.toSet

  test("golden: plain") {
    assert(Analysis.analyze("The quick BROWN fox", stop).toSeq ===
      Seq("quick", "brown", "fox"))
  }

  test("golden: uax29 punctuation/numbers") {
    // UAX#29: hyphenated words split; can't keeps the apostrophe;
    // 3.14 stays one numeric token; b2b stays one token
    assert(Analysis.analyze("state-of-the-art B2B 3.14 can't", stop).toSeq ===
      Seq("state", "art", "b2b", "3.14", "can't"))
  }

  test("golden: unicode") {
    val out = Analysis.analyze("Ünïcode 北京 naïve", Set.empty).toSeq
    assert(out.head === "ünïcode")
    assert(out.last === "naïve")
    // CJK: ICU segments ideographs (dictionary/character based);
    // pin the observed behavior as golden
    assert(out.drop(1).dropRight(1).mkString === "北京")
  }

  test("golden: stop words") {
    // "be", "or", "not", "to" are ALL in the 33-word set → empty
    // (FIXTURES.md §2 originally wrote ["be","be"], contradicting its
    // own stop list; corrected here and there)
    assert(Analysis.analyze("to be or not to be", stop).toSeq === Seq.empty)
    assert(Analysis.analyze("to be quick or not", stop).toSeq === Seq("quick"))
  }

  test("golden: empty / whitespace / max token length") {
    assert(Analysis.analyze("", stop).isEmpty)
    assert(Analysis.analyze("   ", stop).isEmpty)
    val long = "x" * 300
    val out = Analysis.analyze(long, Set.empty)
    assert(out.length === 1 && out.head.length === 255)
  }

  test("Column pipeline ≡ in-memory analyze on the corpus") {
    import spark.implicits._
    val pages = Corpus.pages(spark, "/root/testdata/sf0.001").limit(50)
    val viaCol = pages.select(col("url"),
        Analysis.analyzeCol(col("text"), Analysis.EnglishStopWords).as("t"))
      .as[(String, Seq[String])].collect().toMap
    pages.collect().foreach { p =>
      assert(viaCol(p.url) === Analysis.analyze(p.text, stop).toSeq,
        s"mismatch for ${p.url}")
    }
  }

  test("extractText(html) == text byte-identically for every url") {
    import spark.implicits._
    val pages = Corpus.pages(spark, "/root/testdata/sf0.001")
    val bad = pages
      .select(col("url"),
        (Analysis.extractTextCol(col("html")) === col("text")).as("ok"))
      .filter(!col("ok")).count()
    assert(bad === 0L)
  }
}
