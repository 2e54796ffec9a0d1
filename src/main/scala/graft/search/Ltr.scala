package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Learning-to-rank re-scoring — the reference's LTR contrib module
  * re-expressed relationally [U solr/contrib/ltr:
  * LTRScoringQuery + LinearModel + feature store; SURVEY.md §2 P2
  * "LTR reranking"]. Shape identical to ReRankQParserPlugin: a base
  * query produces top-N candidates (bounded, TakeOrderedAndProject),
  * then a model scores ONLY those N rows from declared features.
  *
  * A feature is any Column over (base score `s`, docs-table columns) —
  * the function-query registry (ValueSources) plugs in directly, which
  * is exactly the reference's SolrFeature/ValueFeature split. The
  * linear model folds weight·feature left-to-right (documented IEEE
  * order, so an external oracle can reproduce scores bit-for-bit). */
object Ltr {

  final case class LinearModel(features: Seq[(String, Column)],
                               weights: Seq[Double]) {
    require(features.length == weights.length, "one weight per feature")
    /** w·f as a left fold in declaration order. */
    def scoreCol: Column =
      features.zip(weights)
        .map { case ((_, f), w) => lit(w) * f }
        .reduce(_ + _)
  }

  /** Re-rank the top-`topN` candidates of an OR base query (scores
    * summed, mm=1) with `model`; return (rank, doc_id) of the top-k by
    * model score (docId-ascending tie-break, as everywhere). The model
    * only ever sees ≤ topN rows: candidate selection is the same
    * bounded TakeOrderedAndProject as every other topK path, and the
    * feature join broadcasts the candidate side. */
  def rescore(idx: graft.index.IndexView, baseTerms: Seq[String],
              topN: Int, k: Int, model: LinearModel): DataFrame = {
    val rel = new RelationalPath(idx)
    val candidates = rel.scoredTf(baseTerms)
      .groupBy("docId", "doc_id").agg(sum("score").as("s"))
      .orderBy(desc("s"), asc("docId"))
      .limit(topN)
    val withFeatures = broadcast(candidates)
      .join(rel.docsWithId.drop("doc_id"), "docId")
      .withColumn("ltr", model.scoreCol)
    withFeatures
      .orderBy(desc("ltr"), asc("docId"))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("ltr"), asc("docId"))))
      .select(col("rank").cast("int").as("rank"), col("doc_id"))
      .orderBy("rank")
  }
}
