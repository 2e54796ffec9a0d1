package graft.model

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Input corpus row — the exact shape mandated by BASELINE.json:15
  * (Iceberg-style table of Common-Crawl-like web pages). */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** docs table row (SURVEY.md §1.4). `dl` = exact token count,
  * `norm` = SmallFloat-quantized byte, `dlq` = decoded quantized length
  * (the value BM25 actually consumes — materialized so the relational
  * path needs no UDF). Partitioned by `segId` (a contiguous docId range,
  * the analogue of a Lucene segment). */
final case class DocRow(
    segId: Int,
    docId: Long,
    url: String,
    lang: String,
    dl: Int,
    norm: Byte,
    dlq: Int,
    ts: java.sql.Timestamp)

/** docs-table row AS WRITTEN (DocRow + the stored `text` field — the
  * .fdt stored-fields analogue [U lucene/core/.../codecs/
  * compressing/CompressingStoredFieldsFormat.java]): the staged,
  * sort-ordered corpus IS the docs table, so the postings stage reads
  * (docId, text) back as a column-pruned parquet scan instead of a
  * second shuffle or a cache-tier round-trip, and readers that don't
  * need text never touch it (columnar pruning). */
final case class StagedDoc(
    segId: Int,
    docId: Long,
    url: String,
    lang: String,
    dl: Int,
    norm: Byte,
    dlq: Int,
    ts: java.sql.Timestamp,
    text: String)

/** One 128-entry postings block: delta-varint docIds, varint tfs, raw
  * norm bytes, per-doc delta-varint positions; block-max metadata
  * (maxTf + minNorm give a float-monotone-safe score upper bound;
  * maxImpact = tf/(tf+K) maximized over members, for pruning stats). */
final case class Block(
    firstDocId: Long,
    maxDocId: Long,
    count: Int,
    maxTf: Int,
    minNorm: Byte,
    maxImpact: Float,
    docs: Array[Byte],
    tfs: Array[Byte],
    norms: Array[Byte],
    positions: Array[Byte])

/** One postings row: a term's postings for one (segment, salt-slice).
  * Hot terms are split over several salt slices with disjoint, ascending
  * docId ranges (SURVEY.md §4.4); `df`/`ttf` are partials for this row. */
final case class PostingsRow(
    segId: Int,
    term: String,
    salt: Int,
    df: Long,
    ttf: Long,
    blocks: Seq[Block])

/** Per-input-partition lineage row (north-rule resumability evidence):
  * which docId range each partition produced, written with the manifest. */
final case class LineageRow(partId: Int, segId: Int, firstDocId: Long, rows: Long)

/** Intermediate SPIMI run: one term's postings from one input partition
  * (the analogue of one DWPT's in-memory postings at flush,
  * [U lucene/core/.../index/DocumentsWriterPerThread.java]).
  * Fully packed for the merge shuffle: delta-varint docIds, varint tfs,
  * raw norm bytes, per-doc delta-varint positions — ~4-5 bytes/posting
  * on the wire instead of 13+ (shuffle volume is the merge bottleneck
  * at corpus scale). */
final case class Run(
    partId: Int,
    segId: Int,
    term: String,
    salt: Int,
    firstDocId: Long,
    count: Int,
    docs: Array[Byte],
    tfs: Array[Byte],
    norms: Array[Byte],
    positions: Array[Byte])

final case class CollStats(docCount: Long, sumTotalTermFreq: Long, avgdl: Double)

final case class SegmentInfo(segId: Int, nDocs: Long, minDocId: Long, maxDocId: Long)

/** Deterministic `pages` corpus derived from the driver-generated
  * `documents.parquet` (FIXTURES.md §1) — pure column expressions, no
  * UDF, no RNG. */
object Corpus {

  def pages(spark: SparkSession, sfDir: String): Dataset[Page] =
    fromDocuments(spark, spark.read.parquet(s"$sfDir/documents.parquet"))

  /** Deterministic ×R corpus scale-up for benchmarking (FIXTURES.md §1):
    * repeat every document with doc_id' = doc_id + rep·10^7, re-deriving
    * url/ts/html — no RNG, stable across runs and cluster sizes.
    * `files` pins the output partition count (0 = defaultParallelism):
    * a staged corpus table's FILE layout is part of the benchmark input
    * (the arrival-order build's parallelism follows it), so it must not
    * depend on which session staged the table. */
  def pagesRepeated(spark: SparkSession, sfDir: String, repeat: Int,
                    files: Int = 0): Dataset[Page] = {
    if (repeat <= 1) return pages(spark, sfDir)
    // spread the small base table across tasks BEFORE the ×R explode so
    // corpus generation is parallel (the raw file is one row-group)
    val n = if (files > 0) files else spark.sparkContext.defaultParallelism
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(n)
      .withColumn("rep", explode(sequence(lit(0), lit(repeat - 1))))
      .withColumn("doc_id", col("doc_id") + col("rep").cast("long") * lit(10000000L))
    fromDocuments(spark, base)
  }

  private def fromDocuments(spark: SparkSession,
                            documents: org.apache.spark.sql.DataFrame): Dataset[Page] = {
    import spark.implicits._
    documents
      .select(
        format_string("https://example.com/%s/%012d", col("source"), col("doc_id"))
          .as("url"),
        timestamp_seconds(
          unix_timestamp(to_timestamp(lit("2025-10-24 00:00:00"))) + col("doc_id"))
          .as("warc_ts"),
        concat(
          lit("<!DOCTYPE html><html><head><title>"),
          format_string("https://example.com/%s/%012d", col("source"), col("doc_id")),
          lit("</title></head><body><p>"), col("text"), lit("</p></body></html>"))
          .cast("binary").as("html"),
        col("text"),
        col("lang"))
      .as[Page]
  }
}
