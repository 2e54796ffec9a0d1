package graft.search

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.index.InvertedIndex
import graft.util.VarInt

/** The engine's relational face: the same queries the scorer path
  * answers, expressed as declarative DataFrame plans over the decoded
  * postings — Catalyst optimizes them (pushdown, partial aggregation,
  * broadcast), mirroring how the reference's /sql layer compiles SQL to
  * index operations [U solr/core/src/java/org/apache/solr/handler/sql/]
  * (SURVEY.md §3.C: that whole layer IS Catalyst here).
  *
  * Scores here are DOUBLE-precision with the canonical formula (the
  * same algebra as the float32 kernel; identical text to the DuckDB
  * oracle SQL so rank comparisons are robust):
  *   ln(1 + (N - df + 0.5)/(df + 0.5)) · tf/(tf + k1·(1-b + b·dlq/avgdl))
  * Float32-exact scoring lives in the scorer path; ScalaTest asserts
  * both paths agree on ranks.
  */
final class RelationalPath(idx: InvertedIndex) {
  import idx.spark.implicits._

  /** Decoded tf table: (term, docId, tf). Typed flatMap over block
    * binaries; Catalyst prunes the scan to the filtered terms when a
    * term predicate is pushed before decoding. */
  def tfTable(terms: Seq[String] = Nil): Dataset[(String, Long, Int)] = {
    val rows =
      if (terms.isEmpty) idx.postings
      else idx.postings.filter(col("term").isin(terms: _*))
    rows.flatMap { r =>
      r.blocks.iterator.flatMap { b =>
        val docs = VarInt.decodeDeltas(b.docs, b.count, b.firstDocId)
        val tfs = VarInt.decodeInts(b.tfs, b.count)
        docs.indices.iterator.map(i => (r.term, docs(i), tfs(i)))
      }
    }
  }

  /** docs with the original doc_id recovered from the url. */
  def docsWithId: DataFrame =
    idx.docs.withColumn("doc_id",
      element_at(split(col("url"), "/"), -1).cast("long"))

  private def avgdlD: Double = idx.stats.sumTotalTermFreq.toDouble / idx.stats.docCount

  /** Per-(term, doc) double BM25 partial score. */
  def scoredTf(terms: Seq[String]): DataFrame = {
    val n = idx.stats.docCount
    val tf = tfTable(terms).toDF("term", "docId", "tf")
    val stats = idx.termStats.filter(col("term").isin(terms: _*))
      .select(col("term"), col("df"))
    tf.join(broadcast(stats), "term")
      .join(docsWithId.select(col("docId"), col("dlq"), col("doc_id")), "docId")
      .withColumn("score",
        log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf").cast("double") /
            (col("tf").cast("double") +
              lit(1.2) * (lit(0.25) + lit(0.75) * col("dlq").cast("double") / lit(avgdlD)))))
  }

  /** Rank by (score desc, docId asc) — docId is the url-rank, the
    * normative tie-break key shared with the scorer path
    * (TopScoreDocCollector semantics); output exposes the original
    * corpus doc_id. */
  private def rankTopK(perDoc: DataFrame, k: Int): DataFrame =
    perDoc
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("s"), asc("docId"))))
      .filter(col("rank") <= k)
      .select(col("rank").cast("int").as("rank"), col("doc_id"))
      .orderBy("rank")

  /** Single-term top-k: (rank, doc_id). */
  def termTopK(term: String, k: Int): DataFrame =
    rankTopK(scoredTf(Seq(term))
      .select(col("docId"), col("doc_id"), col("score").as("s")), k)

  /** Conjunction (all terms required, scores summed). */
  def andTopK(terms: Seq[String], k: Int): DataFrame =
    rankTopK(
      scoredTf(terms).groupBy("docId", "doc_id")
        .agg(sum("score").as("s"), count(lit(1)).as("c"))
        .filter(col("c") === terms.length)
        .select(col("docId"), col("doc_id"), col("s")), k)

  /** Disjunction with minimumShouldMatch. */
  def orTopK(terms: Seq[String], mm: Int, k: Int): DataFrame =
    rankTopK(
      scoredTf(terms).groupBy("docId", "doc_id")
        .agg(sum("score").as("s"), count(lit(1)).as("c"))
        .filter(col("c") >= mm)
        .select(col("docId"), col("doc_id"), col("s")), k)

  /** MUST + MUST_NOT — anti join on docId. */
  def notTopK(pos: String, neg: String, k: Int): DataFrame = {
    val p = scoredTf(Seq(pos)).select(col("docId"), col("doc_id"), col("score").as("s"))
    val n = scoredTf(Seq(neg)).select(col("docId"))
    rankTopK(p.join(n, Seq("docId"), "left_anti"), k)
  }

  /** Scored term + non-scoring attribute filter (semi join). */
  def filterTopK(term: String, lang: String, k: Int): DataFrame = {
    val p = scoredTf(Seq(term)).select(col("docId"), col("doc_id"), col("score").as("s"))
    val f = idx.docs.filter(col("lang") === lang).select("docId")
    rankTopK(p.join(f, Seq("docId"), "left_semi"), k)
  }

  /** Exact-phrase matching docs (ascending doc_id), two-phase:
    * conjunction candidates, then position verification. */
  def phraseDocs(terms: Seq[String]): DataFrame = {
    val rows = idx.postings.filter(col("term").isin(terms: _*))
    val hits = rows.flatMap { r =>
      r.blocks.iterator.flatMap { b =>
        val docs = VarInt.decodeDeltas(b.docs, b.count, b.firstDocId)
        val tfs = VarInt.decodeInts(b.tfs, b.count)
        val pos = VarInt.decodePositions(b.positions, tfs)
        docs.indices.iterator.map(i => (r.term, docs(i), pos(i)))
      }
    }.toDF("term", "docId", "pos")
    val t0 = terms.head
    val joined = terms.zipWithIndex.tail.foldLeft(
      hits.filter(col("term") === t0).select(col("docId"), col("pos").as("p0"))) {
      case (acc, (t, i)) =>
        acc.join(hits.filter(col("term") === t)
          .select(col("docId"), col("pos").as(s"p$i")), "docId")
    }
    // any position p in p0 with p+i present in every p_i
    joined
      .withColumn("ph",
        exists(col("p0"), p =>
          terms.indices.tail.map(i => array_contains(col(s"p$i"), p + i))
            .foldLeft(lit(true))(_ && _)))
      .filter(col("ph"))
      .join(docsWithId.select("docId", "doc_id"), "docId")
      .select("doc_id").orderBy("doc_id")
  }
}
