package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.index.{IndexBuilder, IndexConfig, IndexView, InvertedIndex}
import graft.model.{DocRow, Page, PostingsRow}
import graft.search.Bm25Stats

/** Incremental (near-real-time) indexing via Structured Streaming —
  * the analogue of the reference's NRT soft-commit pipeline
  * [U solr DirectUpdateHandler2 / lucene DirectoryReader#openIfChanged,
  * SURVEY.md §2.9]: each micro-batch is built into an immutable index
  * GENERATION (a set of segments, exactly like an IndexWriter flush),
  * and a generation manifest (`generations.json`) is committed
  * atomically last — new searchers see the new generation, running
  * searchers keep their snapshot. Batch replay after failure is
  * idempotent: a generation already in the manifest is skipped, and the
  * per-generation build resumes stage-wise (IndexBuilder semantics).
  *
  * Within-batch duplicate urls collapse last-writer-wins by `warc_ts`
  * (the `_version_` ordering analogue
  * [U solr/core/.../update/VersionInfo.java]); cross-generation
  * overwrites need tombstone compaction — a later phase (SURVEY.md
  * §2.3 deletes row).
  */
object StreamingIndexer {

  private def manifestPath(dir: String) = Paths.get(dir, "generations.json")

  /** (genId, docCount, segsAllocated) triples from the streaming
    * manifest (older manifests without "segs" read as 0 and keep their
    * committed layout). */
  def generations(dir: String): Seq[(Long, Long, Long)] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) Seq.empty
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      graft.util.Json.arr(graft.util.Json.parse(s)).map { v =>
        val m = graft.util.Json.obj(v)
        (graft.util.Json.long(m("gen")), graft.util.Json.long(m("docs")),
          m.get("segs").map(graft.util.Json.long).getOrElse(0L))
      }
    }
  }

  private def tlogDir(dir: String, genId: Long) = s"$dir/tlog/gen-$genId"

  /** Update-log write for one batch (idempotent) — the tlog the
    * realtime-get path reads [U solr/core/.../update/TransactionLog.java]:
    * raw stored fields land BEFORE the generation's index build, so a
    * key lookup sees in-flight (uncommitted) docs. html is dropped —
    * the tlog carries the stored fields a /get returns. */
  def writeTlog(spark: SparkSession, batch: Dataset[Page], dir: String,
                genId: Long): Unit = {
    val p = tlogDir(dir, genId)
    if (!Files.exists(Paths.get(p, "_SUCCESS")))
      batch.toDF().drop("html")
        .withColumn("genId", lit(genId))
        .write.mode("overwrite").parquet(p)
  }

  /** Realtime-get: latest version per url by (warc_ts, genId) across
    * ALL tlogs — including generations whose index build has not
    * committed yet (the RealTimeGetComponent contract
    * [U solr/core/.../handler/component/RealTimeGetComponent.java]).
    * `committed` marks whether the row's generation is searchable.
    * The url IN-filter pushes into the tlog parquet scan; the LWW
    * window runs over the ≤|urls|·generations survivors only. At the
    * reference's scale tlogs rotate away below the commit floor — here
    * they accumulate (test corpora; documented trade). */
  def realtimeGet(spark: SparkSession, dir: String, urls: Seq[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val base = Paths.get(dir, "tlog")
    require(Files.exists(base), s"no tlog under $dir")
    val dirs = Files.list(base).iterator().asScala.map(_.toString)
      .filter(p => Files.exists(Paths.get(p, "_SUCCESS"))).toSeq.sorted
    // every tlog write may have crashed pre-_SUCCESS: a /get then has
    // no complete generation to read — that is "no docs", not an error
    // (spark.read.parquet over zero paths throws schema-inference)
    if (dirs.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("url",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("committed",
            org.apache.spark.sql.types.BooleanType))))
    val committed = generations(dir).map(_._1)
    val w = Window.partitionBy("url").orderBy(desc("warc_ts"), desc("genId"))
    spark.read.parquet(dirs: _*)
      .filter(col("url").isin(urls: _*))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .withColumn("committed",
        if (committed.isEmpty) lit(false) else col("genId").isin(committed: _*))
  }

  /** Append one micro-batch as a new generation (idempotent on replay). */
  def appendGeneration(spark: SparkSession, batch: Dataset[Page], dir: String,
                       genId: Long, cfg: IndexConfig): Unit = {
    writeTlog(spark, batch, dir, genId) // tlog first: /get sees in-flight docs
    val gens = generations(dir)
    if (gens.exists(_._1 == genId)) return // replayed batch — committed
    val docIdBase = gens.map(_._2).sum
    // segId block allocated from the RUNNING segment count — never a
    // genId multiplier, which overflowed Int after ~2148 generations
    // (colliding segIds cogrouped distinct generations into one segment
    // with non-ascending blocks, breaking the scorers' binary search)
    val segsAlloc =
      (cfg.numPartitions + cfg.partsPerSegment - 1) / cfg.partsPerSegment
    // legacy generations (manifest rows without "segs") were allocated
    // at genId*1e6; new-style blocks are allocated ABOVE their ceiling,
    // offset by the running sum of new-style segs (a max() would hand
    // every new generation the same base — colliding with each other)
    val legacyCeiling = gens.collect {
      case (g, _, segs) if segs == 0L => (g + 1) * 1000000L
    }.maxOption.getOrElse(0L)
    val segIdBase0 = legacyCeiling + gens.map(_._3).sum
    require(segIdBase0 + segsAlloc <= Int.MaxValue.toLong,
      s"segment id space exhausted: base=$segIdBase0 + $segsAlloc")
    val segIdBase = segIdBase0.toInt

    // within-batch last-writer-wins by (url, warc_ts desc) — _version_
    val w = Window.partitionBy("url").orderBy(desc("warc_ts"))
    import spark.implicits._
    val deduped = batch.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn").as[Page]

    val genDir = s"$dir/gen-$genId"
    val idx = IndexBuilder.build(spark, deduped, genDir,
      cfg.copy(docIdBase = docIdBase, segIdBase = segIdBase))

    val newGens = gens :+ ((genId, idx.stats.docCount, segsAlloc.toLong))
    val json = newGens.map { case (g, n, k) =>
      s"""{"gen":$g,"docs":$n,"segs":$k}""" }
      .mkString("[", ",", "]")
    val tmp = Paths.get(dir, ".generations.json.tmp")
    Files.createDirectories(Paths.get(dir))
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(dir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Start the streaming build: pages stream → per-batch generation
    * append. `commitWithin` maps to the processing-time trigger
    * [U solr/core/.../update/CommitTracker.java]. */
  def start(pagesStream: Dataset[Page], dir: String,
            cfg: IndexConfig = IndexConfig(),
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    pagesStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$dir/_checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Page], batchId: Long) =>
        appendGeneration(batch.sparkSession, batch, dir, batchId, cfg)
      }
      .start()
}

/** Union read view over all committed generations — what a reopened
  * NRT reader sees [U lucene/core/.../index/DirectoryReader#openIfChanged].
  * Collection statistics are the union's (so BM25 weights reflect the
  * whole corpus, like a reopened IndexSearcher); per-generation block
  * metadata (maxTf/minNorm) stays valid because query-time score bounds
  * are computed against the CURRENT stats cache. */
final class GenerationalIndex(val spark: SparkSession, dir: String) extends IndexView {
  import spark.implicits._

  private val gens: Seq[(Long, Long, Long)] = StreamingIndexer.generations(dir)
  require(gens.nonEmpty, s"no committed generations under $dir")
  private def genDirs: Seq[String] = gens.map { case (g, _, _) => s"$dir/gen-$g" }

  val stats: Bm25Stats = {
    val per = genDirs.map(d => InvertedIndex.open(spark, d).stats)
    Bm25Stats(per.map(_.docCount).sum, per.map(_.sumTotalTermFreq).sum)
  }

  def postings: Dataset[PostingsRow] =
    spark.read.parquet(genDirs.map(d => s"$d/postings"): _*).as[PostingsRow]

  def docs: Dataset[DocRow] =
    spark.read.parquet(genDirs.map(d => s"$d/docs"): _*)
      .select("segId", "docId", "url", "lang", "dl", "norm", "dlq", "ts")
      .as[DocRow]

  /** Union df/ttf — aggregated across generations (exact). */
  def termStats: DataFrame =
    spark.read.parquet(genDirs.map(d => s"$d/termstats"): _*)
      .groupBy("term").agg(sum("df").as("df"), sum("ttf").as("ttf"))

  /** Cross-generation updates: a url re-ingested in a later batch
    * SHADOWS its older versions — last-writer-wins by (warc_ts, docId),
    * exposed as implicit tombstones so the per-segment scorers and the
    * relational path mask them exactly like explicit deletes (the
    * `_version_` update-ordering analogue across tlog replays
    * [U solr/core/.../update/VersionInfo.java]). Collection stats still
    * count shadowed docs until compaction, as in the reference. */
  override lazy val hasDeletes: Boolean = {
    import org.apache.spark.sql.functions._
    gens.size > 1 &&
      docs.groupBy("url").count().filter(col("count") > 1).limit(1).count() > 0
  }

  override def tombstones: Dataset[java.lang.Long] = {
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("url").orderBy(desc("ts"), desc("docId"))
    docs.toDF()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .select(col("docId"))
      .as[java.lang.Long]
  }
}
