package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, IndexConfig, InvertedIndex}
import graft.model.Corpus
import graft.pipeline.{Ann, Dedup, TextStats}
import graft.search.{Query, RelationalPath, Searcher, TermQ}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` with an `oracleSql` twin is hash-compared by
  * the driver against DuckDB running that SQL on the same parquet
  * tables; column names/types and determinism are part of the contract
  * (ranked outputs expose (rank, id) with double-precision tie-robust
  * ranking; float32-exact scoring is asserted in `sbt test` against the
  * SpecOracle instead, see SURVEY.md §5.2).
  */
object SparkEntry {

  /** Bump when the on-disk index format changes (stale caches rebuild). */
  private val FormatVersion = "v2"

  private val indexes = new ConcurrentHashMap[String, InvertedIndex]()

  /** Build-or-open the cached index for a testdata dir. */
  def index(spark: SparkSession, sfDir: String): InvertedIndex =
    indexes.computeIfAbsent(sfDir, { _ =>
      val name = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
      val dir = s"/root/repo/target/gindex/$FormatVersion/$name"
      IndexBuilder.build(spark, Corpus.pages(spark, sfDir), dir,
        IndexConfig(numPartitions = 8, partsPerSegment = 2,
          hotTermDf = 300, numSalts = 4, hotSampleRate = 1.0))
    })

  private def rel(spark: SparkSession, sfDir: String): RelationalPath =
    new RelationalPath(index(spark, sfDir))

  private def docsTable(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  private def tpch(spark: SparkSession, sfDir: String, t: String): DataFrame =
    spark.read.parquet(s"$sfDir/$t.parquet")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: build the
    * inverted index and run the flagship BM25 top-10 through the real
    * scorer path (WAND + block-max). */
  def entry(spark: SparkSession): DataFrame = {
    val idx = index(spark, "/root/testdata/sf0.001")
    new Searcher(idx).topK(Query.and("spark", "join"), 10)
  }

  // ---------------------------------------------------------------- //
  //  queries: one per implemented operator (SURVEY.md §2)            //
  // ---------------------------------------------------------------- //

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- IR core: docs/norms, stats (§2.3, §2.6) ----
    "ir_doclen" -> ((s, d) => rel(s, d).docsWithId
      .select(col("doc_id"), col("dl").cast("long").as("dl"),
        col("dlq").cast("long").as("dlq"))
      .orderBy("doc_id")),
    "ir_termstats" -> ((s, d) => index(s, d).termStats
      .select(col("term"), col("df").cast("long").as("df"),
        col("ttf").cast("long").as("ttf"))
      .orderBy("term")),
    "ir_collstats" -> ((s, d) => {
      val st = index(s, d).stats
      s.range(1).select(lit(st.docCount).as("doc_count"),
        lit(st.sumTotalTermFreq).as("sum_ttf"))
    }),
    // ---- IR queries (§2.4, §2.7): (rank, doc_id) top-10 ----
    "ir_q01_term" -> ((s, d) => rel(s, d).termTopK("spark", 10)),
    "ir_q02_term_hot" -> ((s, d) => rel(s, d).termTopK("the", 10)),
    "ir_q03_term_absent" -> ((s, d) => rel(s, d).termTopK("zzzmissing", 10)),
    "ir_q04_and" -> ((s, d) => rel(s, d).andTopK(Seq("spark", "join"), 10)),
    "ir_q05_and3" -> ((s, d) => rel(s, d).andTopK(Seq("spark", "the", "merge"), 10)),
    "ir_q06_or" -> ((s, d) => rel(s, d).orTopK(Seq("window", "batch"), 1, 10)),
    "ir_q07_or_mm2" -> ((s, d) => rel(s, d).orTopK(Seq("sort", "merge", "window"), 2, 10)),
    "ir_q08_not" -> ((s, d) => rel(s, d).notTopK("spark", "merge", 10)),
    "ir_q09_filter" -> ((s, d) => rel(s, d).filterTopK("spark", "en", 10)),
    "ir_q10_phrase" -> ((s, d) => rel(s, d).phraseDocs(Seq("batch", "batch"))),
    "ir_q11_prefix" -> ((s, d) => rel(s, d).prefixTopK("s", 10)),
    "ir_q12_range" -> ((s, d) => rel(s, d).rangeTopK("batch", "data", 10)),
    "ir_q13_fuzzy" -> ((s, d) => rel(s, d).fuzzyTopK("spork", 1, 10)),
    "ir_q14_dismax" -> ((s, d) => rel(s, d).dismaxTopK(Seq("spark", "merge"), 0.3, 10)),
    "ir_q15_boost" -> ((s, d) => rel(s, d).boostedOrTopK(Seq("spark" -> 2.0, "merge" -> 1.0), 10)),
    "ir_q16_page2" -> ((s, d) => rel(s, d).termPage("spark", 11, 20)),
    "ir_q17_collapse" -> ((s, d) => rel(s, d).collapseByLang("spark")),
    "ir_q18_facet" -> ((s, d) => rel(s, d).facetByLang("spark")),
    "ir_q19_matchall" -> ((s, d) => rel(s, d).matchAllTopK(10)),
    "ir_q20_tsrange" -> ((s, d) => rel(s, d).tsRangeTopK("spark",
      "2025-10-24 00:02:00", "2025-10-24 00:06:00", 10)),
    // ---- training-data pipeline: dedup (§prompt) ----
    "dd_exact" -> ((s, d) => Dedup.exactGroups(docsTable(s, d)).orderBy("keep_id")),
    "dd_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(docsTable(s, d), n = 3, threshold = 0.12)),
    "dd_minhash_lsh" -> ((s, d) =>
      Dedup.minhashNearDups(docsTable(s, d), threshold = 0.12)),
    "dd_simhash" -> ((s, d) => Dedup.simhashNearDups(docsTable(s, d), maxDist = 18)),
    // ---- text analysis ----
    "tx_counts" -> ((s, d) => TextStats.countingStats(docsTable(s, d)).orderBy("doc_id")),
    "tx_quality" -> ((s, d) => TextStats.qualityScore(docsTable(s, d)).orderBy("doc_id")),
    "tx_langid" -> ((s, d) => TextStats.langId(docsTable(s, d)).orderBy("doc_id")),
    "tx_fp_md5" -> ((s, d) => TextStats.md5Fingerprint(docsTable(s, d)).orderBy("doc_id")),
    "tx_fp_rolling" -> ((s, d) => TextStats.rollingFingerprint(docsTable(s, d)).orderBy("doc_id")),
    // ---- similarity search over embeddings ----
    "ann_brute" -> ((s, d) => {
      val emb = tpch(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
      Ann.bruteTopK(emb, q, 5)
    }),
    "ann_lsh" -> ((s, d) => {
      val emb = tpch(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
      Ann.lshTopK(emb, q, 5, dim = 64, numPlanes = 6)
    }),
    // ---- reference streaming-expression / facet analogues (§2.5-2.7) ----
    "sx_facet_field" -> ((s, d) => docsTable(s, d)
      .groupBy("lang").agg(count(lit(1)).as("n")).orderBy("lang")),
    "sx_facet_range" -> ((s, d) => tpch(s, d, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).orderBy("day")),
    "sx_rollup" -> ((s, d) => tpch(s, d, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")),
    "sx_hashjoin" -> ((s, d) => tpch(s, d, "orders")
      .join(broadcast(tpch(s, d, "customer")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")),
    "sx_mergejoin" -> ((s, d) => tpch(s, d, "lineitem")
      .join(tpch(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")),
    "sx_rank" -> ((s, d) => tpch(s, d, "orders")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)
      .select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))).as("rank"),
        col("o_orderkey"))),
    "sx_unique" -> ((s, d) => tpch(s, d, "events")
      .select("event_type").distinct().orderBy("event_type")),
    "sx_collapse" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
      tpch(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey")
        .orderBy("o_custkey")
    }),
    "sx_stats" -> ((s, d) => tpch(s, d, "lineitem")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("double").as("sum_qty"),
        min(col("l_quantity")).cast("double").as("min_qty"),
        max(col("l_quantity")).cast("double").as("max_qty"))),
    "sx_pivot" -> ((s, d) => docsTable(s, d)
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      .orderBy("lang", "source")),
    "sx_distinct" -> ((s, d) => tpch(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n_parts"))
      .orderBy("l_returnflag")),
    "sx_significant" -> ((s, d) =>
      graft.search.SignificantTerms.forTerm(index(s, d), "dup", minFgDf = 2, limit = 10)
        .select("term", "fg_df", "bg_df"))
  )

  // ---------------------------------------------------------------- //
  //  oracleSql: DuckDB twins (omitted → rows-only check)             //
  // ---------------------------------------------------------------- //

  /** Shared CTE prefix: tokenization (the corpus is single-space
    * separated [a-z0-9]+ words, where UAX#29 == string_split), quantized
    * doc lengths (SmallFloat intToByte4∘byte4ToInt in integer SQL), df
    * and double-precision BM25 — textually the same arithmetic as
    * RelationalPath so rank comparisons are robust. */
  private val bm25Cte: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
      |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
      |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      |dlq AS (SELECT doc_id, (CASE WHEN dl < 8 THEN dl ELSE ((((dl >> (CAST(floor(log2(dl)) AS INT) - 3)) & 7) | 8) << (CAST(floor(log2(dl)) AS INT) - 3)) END)::BIGINT AS dlq FROM dl),
      |cs AS (SELECT count(*)::BIGINT AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
      |scored AS (SELECT t.term, t.doc_id, ln(1.0 + (cs.n - d.df + 0.5) / (d.df + 0.5)) * (t.tf / (t.tf + 1.2 * (0.25 + 0.75 * q.dlq / cs.avgdl))) AS score FROM tf t JOIN dfs d USING (term) JOIN dlq q USING (doc_id), cs)"""
      .stripMargin

  /** Tie-break = url order = (source, doc_id) order — identical to the
    * engine's docId (url-rank) tie-break, see FIXTURES.md §1/§3. */
  /** Constant-score term-set query: any matching term, rank = url order. */
  private def constSetSql(termPred: String): String =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |sel AS (SELECT DISTINCT t.doc_id FROM tok t WHERE $termPred)
       |SELECT CAST(rank AS INTEGER) AS rank, doc_id FROM (
       |  SELECT row_number() OVER (ORDER BY d.source ASC, sel.doc_id ASC) AS rank, sel.doc_id
       |  FROM sel JOIN documents d USING (doc_id)) WHERE rank <= 10 ORDER BY rank""".stripMargin

  private def topkSql(body: String): String =
    s"$bm25Cte, sel AS ($body) SELECT CAST(rank AS INTEGER) AS rank, doc_id FROM (SELECT row_number() OVER (ORDER BY s DESC, src ASC, doc_id ASC) AS rank, doc_id FROM (SELECT sel.doc_id, sel.s, d.source AS src FROM sel JOIN documents d USING (doc_id))) WHERE rank <= 10 ORDER BY rank"

  def oracleSql: Map[String, String] = Map(
    "ir_doclen" ->
      """WITH dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents)
        |SELECT doc_id, dl::BIGINT AS dl,
        |  (CASE WHEN dl < 8 THEN dl ELSE ((((dl >> (CAST(floor(log2(dl)) AS INT) - 3)) & 7) | 8) << (CAST(floor(log2(dl)) AS INT) - 3)) END)::BIGINT AS dlq
        |FROM dl ORDER BY doc_id""".stripMargin,
    "ir_termstats" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS ttf
        |FROM tok GROUP BY term ORDER BY term""".stripMargin,
    "ir_collstats" ->
      """SELECT count(*)::BIGINT AS doc_count,
        |  sum(len(string_split(text, ' ')))::BIGINT AS sum_ttf FROM documents""".stripMargin,
    "ir_q01_term" -> topkSql(
      "SELECT doc_id, score AS s FROM scored WHERE term = 'spark'"),
    "ir_q02_term_hot" -> topkSql(
      "SELECT doc_id, score AS s FROM scored WHERE term = 'the'"),
    "ir_q03_term_absent" -> topkSql(
      "SELECT doc_id, score AS s FROM scored WHERE term = 'zzzmissing'"),
    "ir_q04_and" -> topkSql(
      "SELECT doc_id, sum(score) AS s FROM scored WHERE term IN ('spark','join') GROUP BY doc_id HAVING count(*) = 2"),
    "ir_q05_and3" -> topkSql(
      "SELECT doc_id, sum(score) AS s FROM scored WHERE term IN ('spark','the','merge') GROUP BY doc_id HAVING count(*) = 3"),
    "ir_q06_or" -> topkSql(
      "SELECT doc_id, sum(score) AS s FROM scored WHERE term IN ('window','batch') GROUP BY doc_id HAVING count(*) >= 1"),
    "ir_q07_or_mm2" -> topkSql(
      "SELECT doc_id, sum(score) AS s FROM scored WHERE term IN ('sort','merge','window') GROUP BY doc_id HAVING count(*) >= 2"),
    "ir_q08_not" -> topkSql(
      "SELECT s1.doc_id, s1.score AS s FROM scored s1 WHERE s1.term = 'spark' AND NOT EXISTS (SELECT 1 FROM scored s2 WHERE s2.term = 'merge' AND s2.doc_id = s1.doc_id)"),
    "ir_q09_filter" -> topkSql(
      "SELECT s1.doc_id, s1.score AS s FROM scored s1 WHERE s1.term = 'spark' AND s1.doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')"),
    "ir_q10_phrase" ->
      "SELECT doc_id FROM documents WHERE ' ' || text || ' ' LIKE '% batch batch %' ORDER BY doc_id",
    "ir_q11_prefix" -> constSetSql("t.term LIKE 's%'"),
    "ir_q12_range" -> constSetSql("t.term >= 'batch' AND t.term <= 'data'"),
    "ir_q13_fuzzy" -> constSetSql("levenshtein(t.term, 'spork') <= 1"),
    "ir_q14_dismax" -> topkSql(
      "SELECT doc_id, max(score) + 0.3 * (sum(score) - max(score)) AS s FROM scored WHERE term IN ('spark','merge') GROUP BY doc_id"),
    "ir_q15_boost" -> topkSql(
      "SELECT doc_id, sum(score * (CASE term WHEN 'spark' THEN 2.0 ELSE 1.0 END)) AS s FROM scored WHERE term IN ('spark','merge') GROUP BY doc_id"),
    "ir_q16_page2" ->
      s"""$bm25Cte, sel AS (SELECT doc_id, score AS s FROM scored WHERE term = 'spark')
         |SELECT CAST(rank AS INTEGER) AS rank, doc_id FROM (
         |  SELECT row_number() OVER (ORDER BY s DESC, src ASC, doc_id ASC) AS rank, doc_id
         |  FROM (SELECT sel.doc_id, sel.s, d.source AS src FROM sel JOIN documents d USING (doc_id)))
         |WHERE rank BETWEEN 11 AND 20 ORDER BY rank""".stripMargin,
    "ir_q17_collapse" ->
      s"""$bm25Cte, sel AS (SELECT s1.doc_id, s1.score AS s, d.lang, d.source AS src
         |  FROM scored s1 JOIN documents d USING (doc_id) WHERE s1.term = 'spark')
         |SELECT lang, doc_id FROM (
         |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang ORDER BY s DESC, src ASC, doc_id ASC) AS rn
         |  FROM sel) WHERE rn = 1 ORDER BY lang""".stripMargin,
    "ir_q18_facet" ->
      s"""$bm25Cte
         |SELECT d.lang, count(*)::BIGINT AS n FROM scored s1
         |JOIN documents d USING (doc_id) WHERE s1.term = 'spark'
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "ir_q19_matchall" ->
      """SELECT CAST(rank AS INTEGER) AS rank, doc_id FROM (
        |  SELECT row_number() OVER (ORDER BY source ASC, doc_id ASC) AS rank, doc_id
        |  FROM documents) WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "ir_q20_tsrange" -> topkSql(
      "SELECT s1.doc_id, s1.score AS s FROM scored s1 WHERE s1.term = 'spark' AND s1.doc_id IN (SELECT doc_id FROM documents WHERE TIMESTAMP '2025-10-24 00:00:00' + to_seconds(doc_id) BETWEEN TIMESTAMP '2025-10-24 00:02:00' AND TIMESTAMP '2025-10-24 00:06:00')"),
    "dd_exact" ->
      """SELECT min(doc_id)::BIGINT AS keep_id, count(*)::BIGINT AS n_docs
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "dd_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)] END AS gs
        |  FROM toks), unnest(gs) AS u(g)),
        |sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
        |inter AS (SELECT l.doc_id AS a, r.doc_id AS b, count(*)::BIGINT AS i
        |  FROM sh l JOIN sh r ON l.g = r.g AND l.doc_id < r.doc_id GROUP BY 1, 2)
        |SELECT a, b FROM inter
        |JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
        |WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.12
        |ORDER BY a, b""".stripMargin,
    "tx_counts" ->
      """SELECT doc_id,
        |  len(string_split(text, ' '))::BIGINT AS n_tokens,
        |  length(text)::BIGINT AS n_chars,
        |  len(list_filter(string_split(text, ' '), x -> x IN
        |    ('a','an','and','are','as','at','be','but','by','for','if','in','into','is','it','no','not','of','on','or','such','that','the','their','then','there','these','they','this','to','was','will','with')))::BIGINT AS n_stop
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tx_fp_md5" ->
      "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id",
    "sx_facet_field" ->
      "SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang ORDER BY lang",
    "sx_facet_range" ->
      "SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS n FROM events GROUP BY 1 ORDER BY day",
    "sx_rollup" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity)::DOUBLE AS sum_qty,
        |count(*)::BIGINT AS n FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sx_hashjoin" ->
      """SELECT c_mktsegment, count(*)::BIGINT AS n_orders FROM orders
        |JOIN customer ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1""".stripMargin,
    "sx_mergejoin" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey GROUP BY 1 ORDER BY 1""".stripMargin,
    "sx_rank" ->
      """SELECT CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rank,
        |o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "sx_unique" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "sx_collapse" ->
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "sx_stats" ->
      """SELECT count(*)::BIGINT AS n, sum(l_quantity)::DOUBLE AS sum_qty,
        |min(l_quantity)::DOUBLE AS min_qty, max(l_quantity)::DOUBLE AS max_qty
        |FROM lineitem""".stripMargin,
    "sx_pivot" ->
      "SELECT lang, source, count(*)::BIGINT AS n FROM documents GROUP BY 1, 2 ORDER BY 1, 2",
    "sx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey)::BIGINT AS n_parts
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "sx_significant" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |fgdocs AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'dup'),
        |fgc AS (SELECT count(*)::BIGINT AS c FROM fgdocs),
        |n AS (SELECT count(*)::BIGINT AS c FROM documents),
        |fg AS (SELECT t.term, count(DISTINCT t.doc_id)::BIGINT AS fg_df
        |  FROM tok t JOIN fgdocs USING (doc_id) GROUP BY 1 HAVING count(DISTINCT t.doc_id) >= 2),
        |bg AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS bg_df FROM tok GROUP BY 1)
        |SELECT term, fg_df, bg_df FROM fg JOIN bg USING (term), fgc, n
        |ORDER BY (fg_df / CAST(fgc.c AS DOUBLE)) / (bg_df / CAST(n.c AS DOUBLE)) DESC, term
        |LIMIT 10""".stripMargin
  )
}
