package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analysis.Analysis
import graft.model._

/** Scratch per-stage profiler for the index build (not part of the
  * driver contract). */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val repeat = args(1).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val pages = Corpus.pagesRepeated(spark, "/root/testdata/sf0.1", repeat)

    t("corpus materialize (count)") { pages.count() }

    t("A: tokenize->shuffle (old order)") {
      pages.select(col("url"), col("lang"), Analysis.analyzeCol(col("text"), Nil).as("tokens"))
        .repartitionByRange(32, col("url"))
        .sortWithinPartitions("url")
        .mapPartitions(it => Iterator.single(it.size.toLong))(
          org.apache.spark.sql.Encoders.scalaLong).collect()
    }

    t("B: shuffle->tokenize (new order)") {
      pages.select(col("url"), col("lang"), col("text"))
        .repartitionByRange(32, col("url"))
        .sortWithinPartitions("url")
        .select(col("url"), col("lang"), Analysis.analyzeCol(col("text"), Nil).as("tokens"))
        .mapPartitions(it => Iterator.single(it.size.toLong))(
          org.apache.spark.sql.Encoders.scalaLong).collect()
    }

    t("C: B + explain") {
      pages.select(col("url"), col("lang"), col("text"))
        .repartitionByRange(32, col("url"))
        .sortWithinPartitions("url")
        .select(col("url"), col("lang"), Analysis.analyzeCol(col("text"), Nil).as("tokens"))
        .explain("formatted")
    }

    spark.stop()
  }
}
