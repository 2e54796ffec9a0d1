package graft.search

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** DEV PROBE (not part of the library surface): times the position-
  * verified serving paths (span-near, interval combinators) against
  * the warm gate index, reporting p50 latency and jobs per run. Run:
  *   sbt -batch "runMain graft.search.PathProbe /root/testdata/sf0.01"
  */
object PathProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val idx = graft.SparkEntry.index(spark, sf).warm()
    val rel = new RelationalPath(idx)

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    })

    def med5(name: String)(f: => Unit): Unit = {
      f // warm
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      val j0 = jobs; f; val dj = jobs - j0
      println(f"[probe] $name%-28s p50=${times(2)}%.4f s  min=${times.head}%.4f  jobs/run=$dj")
    }

    med5("x05 intervalContaining") {
      rel.intervalContainingDocs(Seq("spark", "merge"), 10, "join").collect()
    }
    med5("spanNearDocs relational") {
      rel.spanNearDocs(Seq("spark", "merge"), 3, inOrder = true).collect()
    }
    med5("x02 spannear scorer") {
      new Searcher(idx).topK(SpanNearQ(Seq("spark", "merge"), 3,
        inOrder = true), 10).collect()
    }

    // multi-field edismax: kernel (warm InvertedIndexes) vs the forced
    // general plan (plain IndexView wrappers)
    val urlIdx = graft.SparkEntry.urlIndex(spark, sf).warm()
    def plain(i: graft.index.InvertedIndex): graft.index.IndexView =
      new graft.index.IndexView {
        def spark = i.spark
        def stats = i.stats
        def postings = i.postings
        def docs = i.docs
        def termStats = i.termStats
      }
    val pq = EDisMax.parse("spark src3", "50%")
    med5("edismax 2-field kernel") {
      EDisMax.topK(Seq(idx -> 2.0, urlIdx -> 1.0), pq, 10).collect()
    }
    med5("edismax 2-field general") {
      EDisMax.topK(Seq(plain(idx) -> 2.0, plain(urlIdx) -> 1.0),
        pq, 10).collect()
    }
    spark.stop()
  }
}
