package graft

import org.apache.spark.sql.SparkSession

import graft.search.{Query, Searcher}

/** Manual smoke driver: flagship entry + scorer-path vs relational-path
  * rank agreement on a few queries. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("=== entry() flagship (scorer path, AND spark join) ===")
    val e = SparkEntry.entry(spark)
    e.show(10, truncate = false)
    println(s"entry rows: ${e.count()}")

    val idx = SparkEntry.index(spark, sfDir)
    val searcher = new Searcher(idx)
    val rel = new graft.search.RelationalPath(idx)

    def ranksScorer(q: Query): Seq[Long] =
      searcher.topK(q, 10).collect().map(_.getLong(1)).toSeq
    def docIds(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.collect().map(_.getLong(1)).toSeq

    val checks: Seq[(String, Query, Seq[Long])] = Seq(
      ("q01 term spark", graft.search.TermQ("spark"), docIds(rel.termTopK("spark", 10))),
      ("q04 and spark join", Query.and("spark", "join"), docIds(rel.andTopK(Seq("spark", "join"), 10))),
      ("q06 or window batch", Query.or("window", "batch"), docIds(rel.orTopK(Seq("window", "batch"), 1, 10))),
      ("q07 or-mm2", Query.orMM(2, "sort", "merge", "window"), docIds(rel.orTopK(Seq("sort", "merge", "window"), 2, 10)))
    )
    var ok = true
    checks.foreach { case (name, q, expect) =>
      val got = ranksScorer(q)
      // scorer uses the docs-table docId; relational outputs original doc_id.
      // map scorer docIds -> doc_id via docs table url suffix
      val urlMap = idx.docs.collect().map(d =>
        d.docId -> d.url.substring(d.url.lastIndexOf('/') + 1).toLong).toMap
      val gotDocIds = got.map(urlMap)
      val agree = gotDocIds == expect
      ok &= agree
      println(f"$name%-22s scorer=$gotDocIds oracle=$expect agree=$agree")
    }
    println(if (ok) "SCORER==RELATIONAL: ALL AGREE" else "MISMATCH FOUND")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
