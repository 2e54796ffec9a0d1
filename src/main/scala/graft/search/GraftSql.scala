package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.index.IndexView

/** The engine's SQL face — the analogue of Solr's /sql handler
  * [U solr/core/src/java/org/apache/solr/handler/SQLHandler.java +
  * handler/sql/ Calcite pushdown; SURVEY.md §3.C]. The reference
  * hand-rolls parse→logical→pushdown→distributed-physical; here that
  * entire layer IS Catalyst: we register the index tables as views and
  * `spark.sql` does the rest (predicate pushdown into the parquet
  * scans, partial aggregation, join planning).
  *
  * Views:
  *   graft_docs(segId, docId, url, lang, dl, norm, dlq)
  *   graft_termstats(term, df, ttf)
  *   graft_tf(term, docId, tf)          — decoded posting occurrences
  *   graft_scored(term, docId, score)   — double-precision BM25 partials
  */
object GraftSql {

  def registerViews(idx: IndexView): Unit = {
    val rel = new RelationalPath(idx)
    // live-docs masking: tombstoned / cross-generation-shadowed docs are
    // anti-joined out of every view, exactly like the scorer path —
    // without this the SQL face would resurrect deleted documents
    val liveDocs =
      if (idx.hasDeletes)
        idx.docs.toDF().join(idx.tombstones.toDF("docId"), Seq("docId"), "left_anti")
      else idx.docs.toDF()
    val tf0 = rel.tfTable().toDF("term", "docId", "tf")
    val liveTf =
      if (idx.hasDeletes)
        tf0.join(idx.tombstones.toDF("docId"), Seq("docId"), "left_anti")
      else tf0
    liveDocs.createOrReplaceTempView("graft_docs")
    idx.termStats.createOrReplaceTempView("graft_termstats")
    liveTf.createOrReplaceTempView("graft_tf")
    // full scored view: tf ⨝ stats ⨝ docs with the canonical formula
    val n = idx.stats.docCount
    val avgdl = idx.stats.sumTotalTermFreq.toDouble / idx.stats.docCount
    idx.spark.sql(
      s"""SELECT t.term, t.docId,
         |  ln(1.0 + (CAST($n AS DOUBLE) - s.df + 0.5) / (s.df + 0.5)) *
         |  (CAST(t.tf AS DOUBLE) / (CAST(t.tf AS DOUBLE) +
         |    1.2 * (0.25 + 0.75 * CAST(d.dlq AS DOUBLE) / $avgdl))) AS score
         |FROM graft_tf t
         |JOIN graft_termstats s ON t.term = s.term
         |JOIN graft_docs d ON t.docId = d.docId""".stripMargin)
      .createOrReplaceTempView("graft_scored")
  }

  /** Run a SQL query against the registered views. */
  def sql(idx: IndexView, query: String): DataFrame = {
    registerViews(idx)
    idx.spark.sql(query)
  }
}

/** Significant terms: terms over-represented in a foreground result set
  * versus the background corpus [U solr/solrj/.../io/stream/
  * SignificantTermsStream.java; SURVEY.md §2.6]. Score = fg_df/bg_df
  * ratio weighted by fg coverage. */
object SignificantTerms {

  /** Terms significantly co-occurring with `withTerm`:
    * (term, fg_df, bg_df, ratio) ordered by ratio desc. */
  def forTerm(idx: IndexView, withTerm: String, minFgDf: Long = 2,
              limit: Int = 10): DataFrame = {
    val rel = new RelationalPath(idx)
    val fgDocs = rel.tfTable(Seq(withTerm)).toDF("t0", "docId", "tf0")
      .select("docId")
    val fgCount = fgDocs.count().toDouble
    val n = idx.stats.docCount.toDouble
    val fg = rel.tfTable().toDF("term", "docId", "tf")
      .join(broadcast(fgDocs), "docId") // fg result set ≪ postings
      .groupBy("term").agg(countDistinct("docId").as("fg_df"))
      .filter(col("fg_df") >= minFgDf)
    fg.join(idx.termStats.select(col("term"), col("df").as("bg_df")), "term")
      .withColumn("ratio",
        round((col("fg_df") / lit(fgCount)) / (col("bg_df") / lit(n)), 6))
      .select("term", "fg_df", "bg_df", "ratio")
      .orderBy(desc("ratio"), asc("term"))
      .limit(limit)
  }
}
