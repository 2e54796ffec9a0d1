package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Query elevation — the editorial pin/exclude component
  * [U solr/core/src/java/org/apache/solr/handler/component/
  * QueryElevationComponent.java]: configured doc ids are pinned to the
  * top of the result list IN THE CONFIGURED ORDER (whether or not they
  * ranked organically), excluded ids are dropped, and the organic hits
  * follow with their relative order preserved.
  *
  * Operates on a (rank, doc_id) hits frame, so it composes with every
  * topK face (scorer, relational, edismax). The re-rank happens ON THE
  * DRIVER over the ≤ page-size collected hits (the TopDocs.merge shape
  * every rank tail uses) — no Window operator in the plan. */
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
    val dropSet = (elevated ++ excluded).toSet
    // null doc_ids pass through as organic rows — elevation is a pure
    // reorder/exclusion, never an implicit null filter (an isin NOT
    // would silently drop them)
    val organic = hits
      .select(col("rank").cast("long").as("rank"), col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .filter { case (_, id) => !id.exists(dropSet.contains) }
      .sortBy(_._1)
      .zipWithIndex
      .map { case ((_, id), i) => (m + i + 1, id) }
    val pinned = elevated.zipWithIndex.map { case (id, i) => (i + 1, Option(id)) }
    val all = (pinned ++ organic).toSeq
    (if (k > 0) all.filter(_._1 <= k) else all)
      .toDF("rank", "doc_id")
      .select(col("rank").cast("int").as("rank"), col("doc_id"))
  }
}
