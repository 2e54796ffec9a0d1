package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analysis.Analysis
import graft.index.InvertedIndex

/** Term vectors — the per-doc mini-index (term → tf, positions) the
  * reference materializes at index time
  * [U lucene/core/.../index/TermVectorsConsumer.java,
  * codecs/compressing/CompressingTermVectorsFormat.java;
  * SURVEY.md §2 P2 "term vectors: per-doc mini-index"].
  *
  * Spark-native realization: the stored-fields text column already
  * holds everything a term vector contains, so vectors are re-derived
  * on demand with the SAME analysis chain the index used (identical
  * tokens by construction — the ir gates pin analyze ≡ the oracle's
  * tokenization). The docId predicate pushes into the stored-fields
  * parquet scan, so a K-doc request reads K rows, not the corpus; the
  * per-doc inversion is embarrassingly parallel. */
object TermVectors {

  /** Term vectors for the docs matching `docPred` (a pushdown-able
    * predicate over docId/url): one row per (doc, term) with tf and the
    * 0-based token position span. */
  def forDocs(idx: InvertedIndex,
              docPred: org.apache.spark.sql.Column): DataFrame = {
    val spark = idx.spark
    import spark.implicits._
    idx.storedFields.filter(docPred)
      .select(col("docId"), col("url"), col("text"))
      .as[(Long, String, String)]
      .flatMap { case (docId, url, text) =>
        val tokens = Analysis.analyze(text)
        val m = new java.util.LinkedHashMap[String, (Int, Int, Int)]()
        var pos = 0
        while (pos < tokens.length) {
          val t = tokens(pos)
          val cur = m.get(t)
          if (cur == null) m.put(t, (1, pos, pos))
          else m.put(t, (cur._1 + 1, cur._2, pos))
          pos += 1
        }
        import scala.jdk.CollectionConverters._
        m.entrySet().iterator().asScala.map { e =>
          (docId, url, e.getKey, e.getValue._1.toLong,
            e.getValue._2.toLong, e.getValue._3.toLong)
        }
      }
      .toDF("docId", "url", "term", "tf", "first_pos", "last_pos")
  }
}
