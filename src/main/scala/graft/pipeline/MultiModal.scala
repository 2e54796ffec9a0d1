package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, batch feature extraction as a typed mapPartitions
  * transform — partition-parallel, per-partition decoder init, no
  * shuffle. The decode step is a real dependency-free decoder: PNG /
  * GIF / JPEG container headers (dimensions + color type — the
  * metadata a training pipeline filters and partitions on) and a
  * normalized byte-histogram feature vector (deterministic content
  * features for dedup/ANN). Full pixel decode would slot into the same
  * mapPartitions body when codec libraries are available. */
object MultiModal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class ImageMeta(format: String, width: Int, height: Int,
                             colorType: Int)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 digest: String,
                                 format: String, width: Int, height: Int,
                                 colorType: Int,
                                 features: Seq[Float])

  /** Container-header decode, no codec libs needed:
    *  - PNG: 8-byte signature, then IHDR — width/height big-endian at
    *    offsets 16/20, color type at 25 (PNG spec, RFC 2083 §4.1.1).
    *  - GIF: "GIF87a"/"GIF89a", logical screen width/height
    *    little-endian u16 at 6/8, packed flags byte at 10 (GIF89a spec
    *    §18); colorType = global-color-table depth bits + 1.
    *  - JPEG: FF D8, then marker scan to the first SOFn frame header
    *    (C0–C3, C5–C7, C9–CB, CD–CF): height/width big-endian at +3/+5
    *    past the length, component count at +7 (ITU T.81 §B.2.2).
    * Returns None for anything unrecognized (text, audio, truncated). */
  def decodeImageMeta(p: Array[Byte]): Option[ImageMeta] = {
    def u8(i: Int): Int = p(i) & 0xFF
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (p.length >= 26 &&
      u8(0) == 0x89 && u8(1) == 0x50 && u8(2) == 0x4E && u8(3) == 0x47 &&
      u8(4) == 0x0D && u8(5) == 0x0A && u8(6) == 0x1A && u8(7) == 0x0A &&
      p.slice(12, 16).map(_.toChar).mkString == "IHDR")
      Some(ImageMeta("png", be32(16), be32(20), u8(25)))
    else if (p.length >= 11 &&
      (p.slice(0, 6).map(_.toChar).mkString == "GIF87a" ||
        p.slice(0, 6).map(_.toChar).mkString == "GIF89a"))
      Some(ImageMeta("gif", le16(6), le16(8), (u8(10) & 0x07) + 1))
    else if (p.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      // marker scan: FF <marker> <len BE16> <payload>, stop at SOFn
      var i = 2
      while (i + 9 < p.length) {
        if (u8(i) != 0xFF) return None // desynced — not a valid stream
        // T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        // marker code — skip them rather than reading a bogus length
        if (u8(i + 1) == 0xFF) { i += 1 }
        else {
          val m = u8(i + 1)
          val isSof = (m >= 0xC0 && m <= 0xCF) &&
            m != 0xC4 && m != 0xC8 && m != 0xCC
          if (isSof)
            return Some(ImageMeta("jpeg", be16(i + 7), be16(i + 5), u8(i + 9)))
          // standalone (no length segment): SOI, RSTn, TEM
          if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) i += 2
          else i += 2 + be16(i + 2)
        }
      }
      None
    } else None
  }

  /** Normalized byte-histogram features: 256 byte bins folded into
    * `width` coarse bins, each the fraction of payload bytes landing in
    * its range — deterministic real content features (near-dup images
    * share histograms; format filters come from the header decode). */
  def byteHistogram(payload: Array[Byte], width: Int = 8): Array[Float] = {
    val out = new Array[Float](width)
    if (payload.isEmpty) return out
    val binSize = 256.0 / width
    var i = 0
    while (i < payload.length) {
      out(math.min(width - 1, ((payload(i) & 0xFF) / binSize).toInt)) += 1f
      i += 1
    }
    var b = 0
    while (b < width) { out(b) /= payload.length; b += 1 }
    out
  }

  /** Batch feature extraction — partition-parallel, no shuffle; decoder
    * and digest instances are initialized once per partition (the same
    * amortization a pixel decoder or model handle would need). */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
                      width: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init: one digest instance for the whole partition
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        md.reset()
        val digest = md.digest(m.payload).map("%02x".format(_)).mkString
        val meta = decodeImageMeta(m.payload)
          .getOrElse(ImageMeta("raw", -1, -1, -1))
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, digest,
          meta.format, meta.width, meta.height, meta.colorType,
          byteHistogram(m.payload, width).toSeq)
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
