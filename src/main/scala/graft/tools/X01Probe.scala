package graft.search

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** DEV PROBE (not part of the library surface): decomposes the
  * x01_edismax_mm_pf2 bench query's latency into its plan components —
  * base boolean vs phrase-boost join vs job/stage overhead — against
  * the warm gate index. Run:
  *   sbt -batch "runMain graft.search.X01Probe /root/testdata/sf0.01"
  */
object X01Probe {
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
    val searcher = new Searcher(idx)

    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
      override def onJobEnd(je: SparkListenerJobEnd): Unit = ()
    }
    spark.sparkContext.addSparkListener(listener)

    def med5(name: String)(f: => Unit): Unit = {
      f // warm
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      val j0 = jobs; f; val dj = jobs - j0
      println(f"[probe] $name%-28s p50=${times(2)}%.4f s  min=${times.head}%.4f  jobs/run=$dj")
    }

    val p = EDisMax.parse("sort merge window", "2<67%")
    val fields = Seq((idx: graft.index.IndexView) -> 1.0)

    med5("scorer q07_or_mm2") {
      searcher.topK(BoolQ(
        should = Seq(TermQ("sort"), TermQ("merge"),
          TermQ("window")), minShouldMatch = 2), 10).collect()
    }
    med5("x01 full (mm+pf2)") {
      EDisMax.topK(fields, p, 10,
        pf2 = Seq((idx: graft.index.IndexView) -> 0.4)).collect()
    }
    med5("x01 base (mm, no pf2)") {
      EDisMax.topK(fields, p, 10).collect()
    }
    med5("phraseFreqs 2 grams") {
      rel.phraseFreqs(IndexedSeq(Seq("sort", "merge"), Seq("merge", "window")))
        .collect()
    }
    med5("scoredTf 3 terms") {
      rel.scoredTf(Seq("sort", "merge", "window")).collect()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    med5("x01 full, AQE off") {
      EDisMax.topK(fields, p, 10,
        pf2 = Seq((idx: graft.index.IndexView) -> 0.4)).collect()
    }
    med5("x01 base, AQE off") {
      EDisMax.topK(fields, p, 10).collect()
    }
    med5("scorer q07, AQE off") {
      searcher.topK(BoolQ(
        should = Seq(TermQ("sort"), TermQ("merge"),
          TermQ("window")), minShouldMatch = 2), 10).collect()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
