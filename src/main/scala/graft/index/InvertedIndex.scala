package graft.index

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.{DocRow, PostingsRow}
import graft.search.Bm25Stats

/** Read handle over a committed index directory (manifest.json present).
  * The IndexSearcher-side analogue of a Lucene `DirectoryReader` over a
  * `segments_N` commit point [U lucene/core/.../index/SegmentInfos.java,
  * DirectoryReader]. */
final class InvertedIndex(val spark: SparkSession, val dir: String) {
  import spark.implicits._

  val manifest: String =
    new String(Files.readAllBytes(Paths.get(dir, "manifest.json")))

  /** Collection stats from the manifest — no job needed at query time. */
  val stats: Bm25Stats = {
    def long(k: String): Long =
      ("\"" + k + "\":\\s*(\\d+)").r.findFirstMatchIn(manifest)
        .map(_.group(1).toLong)
        .getOrElse(sys.error(s"manifest missing $k"))
    Bm25Stats(long("docCount"), long("sumTotalTermFreq"))
  }

  def postings: Dataset[PostingsRow] =
    spark.read.parquet(s"$dir/postings").as[PostingsRow]

  def docs: Dataset[DocRow] = spark.read.parquet(s"$dir/docs").as[DocRow]

  def termStats: DataFrame = spark.read.parquet(s"$dir/termstats")

  def lineage: DataFrame = spark.read.parquet(s"$dir/lineage")
}

object InvertedIndex {
  def open(spark: SparkSession, dir: String): InvertedIndex = {
    require(Files.exists(Paths.get(dir, "manifest.json")),
      s"no committed index at $dir (manifest.json missing)")
    new InvertedIndex(spark, dir)
  }
}
