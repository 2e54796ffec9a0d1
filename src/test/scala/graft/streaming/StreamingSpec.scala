package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.index.{CheckIndex, IndexConfig}
import graft.model.Page
import graft.search._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Incremental indexing: two micro-batches → two generations; the union
  * view must agree with a SpecOracle over the full corpus (df/stats
  * exact; scores by url identical), and batch replay must be
  * idempotent. */
class StreamingSpec extends SparkSpec {

  private def page(i: Int, text: String, ts: String = "2025-10-24 00:00:00") =
    Page(f"https://s/$i%04d", java.sql.Timestamp.valueOf(ts),
      s"<p>$text</p>".getBytes, text, "en")

  private val batch1 = Seq(
    page(0, "spark join merge"), page(1, "spark spark batch"),
    page(2, "the window sort"))
  private val batch2 = Seq(
    page(3, "join batch batch window"), page(4, "spark merge sort the"))

  test("two generations: stats union + search over both batches") {
    val dir = Files.createTempDirectory("graft-stream").toString
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val mem = MemoryStream[Page]
    mem.addData(batch1: _*)
    val query = StreamingIndexer.start(mem.toDS(), dir,
      IndexConfig(numPartitions = 2, partsPerSegment = 1),
      Trigger.AvailableNow())
    query.processAllAvailable()
    query.stop()

    mem.addData(batch2: _*)
    val q2 = StreamingIndexer.start(mem.toDS(), dir,
      IndexConfig(numPartitions = 2, partsPerSegment = 1),
      Trigger.AvailableNow())
    q2.processAllAvailable()
    q2.stop()

    assert(StreamingIndexer.generations(dir).size >= 2)

    val idx = new GenerationalIndex(spark, dir)
    val all = batch1 ++ batch2
    val oracle = new SpecOracle(all.map(p => (p.url, p.text, p.lang)))

    // union collection stats == full-corpus oracle
    assert(idx.stats.docCount === oracle.docCount)
    assert(idx.stats.sumTotalTermFreq === oracle.sumTotalTermFreq)

    // df/ttf per term == oracle
    val ts = idx.termStats.as[(String, Long, Long)].collect()
    ts.foreach { case (t, df, ttf) =>
      assert(df === oracle.df(t), s"df($t)")
      assert(ttf === oracle.ttf(t), s"ttf($t)")
    }

    // structural audit across generations (docIds dense across gens)
    assert(CheckIndex.audit(idx).isEmpty)

    // search sees docs from BOTH batches; scores (url-keyed) match the
    // full-corpus oracle (docIds differ in ASSIGNMENT order but stats
    // and per-doc lengths are identical)
    val searcher = new Searcher(idx)
    val got = searcher.topK(TermQ("batch"), 10).collect()
      .map(r => (r.getString(2), r.getFloat(3))).toMap
    val expected = oracle.topK(TermQ("batch"), 10)
      .map { case (_, _, url, s) => url -> s }.toMap
    assert(got === expected)
    assert(got.keySet.exists(_.endsWith("0001")) && got.keySet.exists(_.endsWith("0003")))
  }

  test("replayed batch is idempotent") {
    val dir = Files.createTempDirectory("graft-stream2").toString
    import spark.implicits._
    StreamingIndexer.appendGeneration(spark, batch1.toDS(), dir, 0L,
      IndexConfig(numPartitions = 2, partsPerSegment = 1))
    val before = StreamingIndexer.generations(dir)
    // replay the same batch id — must be a no-op
    StreamingIndexer.appendGeneration(spark, batch1.toDS(), dir, 0L,
      IndexConfig(numPartitions = 2, partsPerSegment = 1))
    assert(StreamingIndexer.generations(dir) === before)
    val idx = new GenerationalIndex(spark, dir)
    assert(idx.stats.docCount === batch1.size)
  }

  test("cross-generation update: newer batch shadows the old version") {
    val dir = Files.createTempDirectory("graft-stream4").toString
    import spark.implicits._
    StreamingIndexer.appendGeneration(spark, batch1.toDS(), dir, 0L,
      IndexConfig(numPartitions = 2, partsPerSegment = 1))
    // re-ingest url 0001 with NEW content, newer ts
    val update = Seq(page(1, "completely fresh replacement text",
      "2025-10-25 00:00:00"))
    StreamingIndexer.appendGeneration(spark, update.toDS(), dir, 1L,
      IndexConfig(numPartitions = 2, partsPerSegment = 1))
    val idx = new GenerationalIndex(spark, dir)
    assert(idx.hasDeletes) // the old version is shadowed
    val searcher = new Searcher(idx)
    // old content must be gone...
    val oldHits = searcher.topK(TermQ("batch"), 10).collect()
      .map(_.getString(2))
    assert(!oldHits.exists(_.endsWith("0001")))
    // ...new content found, at the same url
    val newHits = searcher.topK(TermQ("replacement"), 10).collect()
    assert(newHits.length === 1)
    assert(newHits.head.getString(2).endsWith("0001"))
    // relational path masks it too
    val rel = new RelationalPath(idx)
    assert(!rel.docsWithId.filter(org.apache.spark.sql.functions.col("url")
      .endsWith("0001")).collect().map(_.getAs[Long]("docId")).contains(1L) ||
      rel.docsWithId.filter(org.apache.spark.sql.functions.col("url")
        .endsWith("0001")).count() === 1)
  }

  test("realtime-get: tlog lookup sees uncommitted docs, LWW across gens") {
    val dir = Files.createTempDirectory("graft-rtg").toString
    import spark.implicits._
    val cfg = IndexConfig(numPartitions = 2, partsPerSegment = 1)
    // tlog written, generation NOT committed: /get sees it, search can't
    StreamingIndexer.writeTlog(spark, batch1.toDS(), dir, 0L)
    val inflight = StreamingIndexer.realtimeGet(spark, dir, Seq("https://s/0001"))
      .collect()
    assert(inflight.length === 1)
    assert(inflight.head.getAs[String]("text") === "spark spark batch")
    assert(!inflight.head.getAs[Boolean]("committed"))
    // commit — same lookup now reports committed (searchable)
    StreamingIndexer.appendGeneration(spark, batch1.toDS(), dir, 0L, cfg)
    assert(StreamingIndexer.realtimeGet(spark, dir, Seq("https://s/0001"))
      .collect().head.getAs[Boolean]("committed"))
    // a NEWER uncommitted version wins the LWW lookup
    StreamingIndexer.writeTlog(spark,
      Seq(page(1, "rtg fresh text", "2025-10-26 00:00:00")).toDS(), dir, 1L)
    val latest = StreamingIndexer.realtimeGet(spark, dir, Seq("https://s/0001"))
      .collect()
    assert(latest.length === 1)
    assert(latest.head.getAs[String]("text") === "rtg fresh text")
    assert(!latest.head.getAs[Boolean]("committed"))
  }

  test("realtime-get: incomplete tlog (no _SUCCESS generation) is empty, not an error") {
    val dir = Files.createTempDirectory("graft-rtg-empty").toString
    // simulate a writer crash after mkdir but before _SUCCESS
    Files.createDirectories(java.nio.file.Paths.get(dir, "tlog", "gen-0"))
    val got = StreamingIndexer.realtimeGet(spark, dir, Seq("https://s/0001"))
    assert(got.count() === 0)
  }

  test("within-batch duplicate urls collapse last-writer-wins") {
    val dir = Files.createTempDirectory("graft-stream3").toString
    import spark.implicits._
    val dup = Seq(
      page(7, "old text version", "2025-10-24 00:00:00"),
      page(7, "new text version wins", "2025-10-24 01:00:00"))
    StreamingIndexer.appendGeneration(spark, dup.toDS(), dir, 0L,
      IndexConfig(numPartitions = 2, partsPerSegment = 1))
    val idx = new GenerationalIndex(spark, dir)
    assert(idx.stats.docCount === 1L)
    val hits = new Searcher(idx).topK(TermQ("wins"), 10).collect()
    assert(hits.length === 1)
  }
}
