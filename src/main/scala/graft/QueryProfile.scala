package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.InvertedIndex
import graft.search._

/** Scratch query-path profiler over a pre-built bench index. */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val idx = InvertedIndex.open(spark, dir)
    val searcher = new Searcher(idx)

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[qprof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    import spark.implicits._

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      t("read rows term=spark (count)") {
        idx.postings.filter(col("term") === "spark").count()
      }
      t("read rows collect size") {
        idx.postings.filter(col("term") === "spark").collect().map(_.blocks.size).sum
      }
      t("scoredHits spark k=10") {
        searcher.scoredHits(TermQ("spark"), 10).collect().length
      }
      t("topK spark k=10") {
        searcher.topK(TermQ("spark"), 10).collect().length
      }
      t("scoredHits or(window,batch)") {
        searcher.scoredHits(Query.or("window", "batch"), 10).collect().length
      }
      t("termStats lookup") {
        idx.termStats.filter(col("term").isin("spark")).collect().length
      }
      t("docs join only") {
        val hits = Seq((1L, 1.0f)).toDF("docId", "score")
        idx.docs.select("docId", "url").join(broadcast(hits), "docId").collect().length
      }
    }
    spark.stop()
  }
}
