package graft.index

import java.nio.file.Files

import graft.SparkSpec
import graft.model.Page
import graft.search._

/** The arrival-order build (`IndexConfig.inputOrdered` — Lucene's
  * IndexWriter default: docIds in ingestion order, no index-time sort,
  * and therefore NO full-width text shuffle) must be search-equivalent
  * to the sorted build: identical collection stats, identical per-term
  * df/ttf, and identical (url, score) top-k for every query shape —
  * only the docId↔url assignment differs. */
class InputOrderSpec extends SparkSpec {

  private def tmpDir(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  /** Stage a deterministic corpus to parquet (the input-order contract
    * is defined over a STORED table) across several files, and shrink
    * split planning so the scan really has multiple partitions. */
  private def stagedCorpus(n: Int): String = {
    import spark.implicits._
    val dir = tmpDir("ioc")
    val words = Vector("spark", "join", "merge", "sort", "window", "batch",
      "the", "quick", "stream", "shuffle", "index", "query")
    val pages = (0 until n).map { i =>
      val t = (0 to i % 7).map(j => words((i * 13 + j * 5) % words.length))
        .mkString(" ")
      Page(f"https://t/${(i * 2654435761L) % 100000}%05d-$i", // urls NOT in input order
        java.sql.Timestamp.valueOf("2025-10-24 00:00:00"),
        s"<p>$t</p>".getBytes, t, if (i % 3 == 0) "en" else "de")
    }
    spark.createDataset(pages).repartition(6).write.parquet(s"$dir/pages")
    s"$dir/pages"
  }

  private def urlScores(idx: InvertedIndex, q: Query, k: Int): Seq[(String, Float)] = {
    val s = new Searcher(idx)
    s.topK(q, k).collect()
      .map(r => (r.getAs[String]("url"), r.getAs[Float]("score")))
      .toSeq.sortBy { case (u, sc) => (-sc, u) }
  }

  test("arrival-order build ≡ sorted build on stats, termstats and (url, score) top-k") {
    {
      val corpus = stagedCorpus(800)
      import spark.implicits._
      val pages = spark.read.parquet(corpus).as[Page]
      val sorted = IndexBuilder.build(spark, pages, tmpDir("sortedb"),
        IndexConfig(numPartitions = 5, partsPerSegment = 2, hotTermDf = 50))
      // tiny split size (below the per-file bytes, and below the pinned
      // 1 MiB openCost so every file is its own partition) — the
      // multi-partition machinery must be exercised at test scale
      val arrival = IndexBuilder.build(spark, pages, tmpDir("arrival"),
        IndexConfig(partsPerSegment = 2, hotTermDf = 50, inputOrdered = true,
          inputSplitBytes = 16 << 10))

      // the input really was multi-partition (otherwise the mode's
      // partition machinery is untested)
      assert(arrival.segments.length >= 2,
        s"expected a multi-segment arrival-order index, got ${arrival.segments.toSeq}")

      // collection stats identical
      assert(arrival.stats.docCount === sorted.stats.docCount)
      assert(arrival.stats.sumTotalTermFreq === sorted.stats.sumTotalTermFreq)

      // per-term df/ttf identical
      def ts(i: InvertedIndex) = i.termStats.select("term", "df", "ttf").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(ts(arrival) === ts(sorted))

      // structural audit clean
      assert(CheckIndex.audit(arrival) === Seq.empty)

      // search equivalence modulo the docId↔url mapping: identical
      // (url, score) result sets for every query shape
      val queries: Seq[Query] = Seq(
        TermQ("spark"), TermQ("the"),
        Query.and("spark", "join"), Query.or("window", "batch"),
        Query.orMM(2, "sort", "merge", "window"),
        Query.not("spark", "merge"), PhraseQ(Seq("spark", "join")))
      queries.foreach { q =>
        assert(urlScores(arrival, q, 2000) === urlScores(sorted, q, 2000),
          s"query $q differs between arrival-order and sorted builds")
      }
    }
  }

  test("arrival-order docIds are deterministic across rebuilds") {
    {
      val corpus = stagedCorpus(300)
      import spark.implicits._
      val pages = spark.read.parquet(corpus).as[Page]
      val a = IndexBuilder.build(spark, pages, tmpDir("det1"),
        IndexConfig(inputOrdered = true, hotTermDf = 50,
          inputSplitBytes = 16 << 10))
      val b = IndexBuilder.build(spark, pages, tmpDir("det2"),
        IndexConfig(inputOrdered = true, hotTermDf = 50,
          inputSplitBytes = 16 << 10))
      def docMap(i: InvertedIndex) = i.docs.selectExpr("docId", "url").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(docMap(a) === docMap(b))
    }
  }

  test("inputOrdered rejects an index-time sort") {
    import spark.implicits._
    val pages = spark.createDataset(Seq(
      Page("https://t/0", java.sql.Timestamp.valueOf("2025-10-24 00:00:00"),
        "<p>x</p>".getBytes, "x", "en")))
    assertThrows[IllegalArgumentException] {
      IndexBuilder.build(spark, pages, tmpDir("bad"),
        IndexConfig(inputOrdered = true, sortKeySql = Some("lang")))
    }
  }
}
