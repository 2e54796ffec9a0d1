package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query elevation — the editorial pin/exclude component
  * [U solr/core/src/java/org/apache/solr/handler/component/
  * QueryElevationComponent.java]: configured doc ids are pinned to the
  * top of the result list IN THE CONFIGURED ORDER (whether or not they
  * ranked organically), excluded ids are dropped, and the organic hits
  * follow with their relative order preserved.
  *
  * Operates on a (rank, doc_id) hits frame, so it composes with every
  * topK face (scorer, relational, edismax). The re-rank Window runs
  * over ≤ k already-materialized hit rows — the bounded-input Window
  * pattern shared with the other rank attachments. */
object Elevation {

  /** @param k when > 0, trim the final list to k rows. The reference
    *        applies exclusion BEFORE its rows cutoff and backfills from
    *        deeper organic hits — to reproduce that page shape, fetch
    *        `hits` with k + excluded.size (+ pinned non-hits) rows and
    *        pass the page size here; with k = 0 the edited list is
    *        returned whole. */
  def elevate(hits: DataFrame, elevated: Seq[Long],
              excluded: Seq[Long] = Nil, k: Int = 0): DataFrame = {
    require(elevated.nonEmpty || excluded.nonEmpty,
      "elevation needs at least one pinned or excluded id")
    require(elevated.distinct.length == elevated.length,
      s"duplicate elevated ids: $elevated")
    require(elevated.intersect(excluded).isEmpty,
      s"ids both elevated and excluded: ${elevated.intersect(excluded)}")
    val spark = hits.sparkSession
    import spark.implicits._
    val m = elevated.length
    val drop = (elevated ++ excluded).map(Long.box)
    val organic = hits
      .filter(!col("doc_id").isin(drop: _*))
      .withColumn("rank",
        (row_number().over(Window.orderBy(asc("rank"))) + m).cast("int"))
      .select(col("rank"), col("doc_id"))
    val pinned = elevated.zipWithIndex
      .map { case (id, i) => (i + 1, id) }
      .toDF("rank", "doc_id")
      .select(col("rank").cast("int").as("rank"), col("doc_id"))
    val all = pinned.unionByName(organic)
    (if (k > 0) all.filter(col("rank") <= k) else all).orderBy("rank")
  }
}
