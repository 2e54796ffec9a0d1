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

  def elevate(hits: DataFrame, elevated: Seq[Long],
              excluded: Seq[Long] = Nil): DataFrame = {
    require(elevated.nonEmpty || excluded.nonEmpty,
      "elevation needs at least one pinned or excluded id")
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
    pinned.unionByName(organic).orderBy("rank")
  }
}
