package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, batch feature extraction as a typed mapPartitions
  * transform. The actual image/audio DECODE is a clearly-marked stub
  * (codec libraries are not in this container); everything Spark-side —
  * schema, batching, partitioning, deterministic fallback features — is
  * real and tested. */
object MultiModal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 digest: String, features: Seq[Float])

  /** STUB — real decoder goes here (e.g. JPEG→pixels, PCM→spectrogram).
    * The deterministic fake derives a fixed-width feature vector from
    * payload bytes so downstream pipeline shapes (ANN over features,
    * dedup over digests) are exercised end-to-end. */
  def decodeFeaturesStub(payload: Array[Byte], width: Int = 8): Array[Float] = {
    val out = new Array[Float](width)
    var i = 0
    while (i < payload.length) {
      out(i % width) += (payload(i) & 0xFF) / 255f
      i += 1
    }
    out
  }

  /** Batch feature extraction — partition-parallel, no shuffle; a real
    * decoder would amortize model/codec init per partition exactly like
    * this. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
                      width: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init (decoder/model handle) would happen here
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        md.reset()
        val digest = md.digest(m.payload).map("%02x".format(_)).mkString
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, digest,
          decodeFeaturesStub(m.payload, width).toSeq)
      }
    }
  }

  /** Derive a media table from the pages corpus html payloads (binary
    * column) — the corpus' stand-in for image/audio bytes. */
  def mediaFromPages(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.model.Corpus.pages(spark, sfDir)
      .select(element_at(split(col("url"), "/"), -1).cast("long").as("media_id"),
        lit("html").as("kind"), col("html").as("payload"))
      .as[MediaRow]
  }
}
