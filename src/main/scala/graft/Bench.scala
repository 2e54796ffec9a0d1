package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexConfig}
import graft.model.Corpus
import graft.search.{Query, Searcher, TermQ, PhraseQ}

/** Benchmark harness (driver contract): build the index over
  * SPARK_GRAFT_SF_DIR (scaled ×SPARK_GRAFT_REPEAT) and run the
  * reference query set through the scorer path; prints ONE JSON line
  * with per-query seconds plus build throughput and latency
  * percentiles. Set SPARK_GRAFT_SCALING=1 to run the same build at
  * local[8] and local[32] and report scaling efficiency
  * (the sandbox proxy for N vs 4N executors, BASELINE.md). */
object Bench {

  private val querySet: Seq[(String, Query)] = Seq(
    "q01_term" -> TermQ("spark"),
    "q02_term_hot" -> TermQ("the"),
    "q03_term_absent" -> TermQ("zzz_absent"),
    "q04_and" -> Query.and("spark", "join"),
    "q05_and3" -> Query.and("spark", "the", "merge"),
    "q06_or" -> Query.or("window", "batch"),
    "q07_or_mm2" -> Query.orMM(2, "sort", "merge", "window"),
    "q08_not" -> Query.not("spark", "merge"),
    "q09_filter" -> graft.search.BoolQ(must = Seq(TermQ("spark")),
      filter = Seq(graft.search.AttrQ("lang", "en"))),
    "q10_phrase" -> PhraseQ(Seq("batch", "batch")))

  private def newSession(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
      // straggler mitigation — on an oversubscribed host (or a real
      // 1000-executor cluster) any stage barrier waits for its slowest
      // task; speculative re-execution bounds that wait
      .config("spark.speculation", "true")
      .config("spark.speculation.multiplier", "2")
      .config("spark.speculation.quantile", "0.75")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def rmrf(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
  }

  /** Timed fresh build; returns (seconds, docCount). The ×R corpus is
    * materialized to parquet ONCE (untimed) — the north-rule input is a
    * stored Iceberg-style table, not an on-the-fly generator, and the
    * generator would otherwise be evaluated twice (range-partitioner
    * sampling pass + real pass) inside the timed region. */
  private def timedBuild(spark: SparkSession, sfDir: String, repeat: Int,
                         dir: String): (Double, Long) = {
    rmrf(dir)
    import spark.implicits._
    val corpusDir = new java.io.File(dir).getParent + s"/corpus$repeat"
    if (!Files.exists(Paths.get(corpusDir, "_SUCCESS")))
      Corpus.pagesRepeated(spark, sfDir, repeat).write
        .mode("overwrite").parquet(corpusDir)
    val pages = spark.read.parquet(corpusDir).as[graft.model.Page]
    val t0 = System.nanoTime()
    val idx = IndexBuilder.build(spark, pages, dir,
      IndexConfig(numPartitions = 64, partsPerSegment = 8,
        hotTermDf = 2000, numSalts = 4))
    ((System.nanoTime() - t0) / 1e9, idx.stats.docCount)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "8").toInt
    val scaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "0") == "1"
    // SPARK_GRAFT_TMPFS=1: put shuffle + index on tmpfs so the scaling
    // measurement isolates compute (one shared local disk does not
    // scale with threads; per-executor disks on a real cluster do)
    val benchRoot = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR",
      "/root/repo/target/bench-index")

    if (scaling) {
      // same input, same partitioning — only executor-thread count varies
      val spark8 = newSession(8)
      val (t8, n) = timedBuild(spark8, sfDir, repeat, s"$benchRoot/scale8")
      spark8.stop()
      val spark32 = newSession(32)
      val (t32, _) = timedBuild(spark32, sfDir, repeat, s"$benchRoot/scale32")
      spark32.stop()
      val eff = (t8 / t32) / 4.0
      println(f"""{"metric":"scaling","value":$eff%.4f,"unit":"efficiency","docs":$n,"t8":$t8%.2f,"t32":$t32%.2f,"docsPerSec8":${n / t8}%.1f,"docsPerSec32":${n / t32}%.1f,"sf":"$sfDir"}""")
      return
    }

    val spark = newSession(cpus)
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    val (buildSec, docCount) = timedBuild(spark, sfDir, repeat, s"$benchRoot/main$cpus")
    results += "build" -> buildSec
    // warm index (BASELINE.md: latency measured on a warm index — the
    // reference's warm-searcher serving mode)
    val idx = graft.index.InvertedIndex.open(spark, s"$benchRoot/main$cpus").warm()
    val searcher = new Searcher(idx)

    // warm once (parquet footers, code paths), then measure
    querySet.foreach { case (_, q) => searcher.topK(q, 10).collect() }
    val perQuery = querySet.map { case (name, q) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        searcher.topK(q, 10).collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      results += name -> times(times.length / 2) // median
      times(times.length / 2)
    }
    val sortedQ = perQuery.sorted
    val p50 = sortedQ(sortedQ.length / 2)
    val p99 = sortedQ.last
    val total = results.values.sum

    val qs = results.map { case (k, v) => f""""$k":$v%.4f""" }.mkString("{", ",", "}")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","docs":$docCount,"buildDocsPerSec":${docCount / buildSec}%.1f,"queryP50":$p50%.4f,"queryP99":$p99%.4f,"cpus":$cpus,"repeat":$repeat}""")
    spark.stop()
  }
}
