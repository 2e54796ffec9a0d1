package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parent/child block join — the reference indexes parent+children as a
  * contiguous doc block and joins at query time
  * [U lucene/join/.../ToParentBlockJoinQuery.java, ToChildBlockJoinQuery;
  * Solr {!parent}/{!child}; SURVEY.md §2.5]. Spark-native realization:
  * the "block" IS a nested `array<struct>` column (one shuffle to build,
  * bounded by per-parent fanout), and the two join directions are an
  * `exists()` filter (codegen, no join at query time) and an `explode`.
  */
object BlockJoin {

  /** Index-time blocking: nest each parent's children as an
    * array<struct> column `children` (docs-in-a-block analogue). */
  def nest(parents: DataFrame, children: DataFrame,
           parentKey: String, childFk: String): DataFrame =
    parents.join(
      children.groupBy(col(childFk).as(parentKey))
        .agg(collect_list(struct(children.columns.map(col): _*)).as("children")),
      Seq(parentKey), "left")

  /** {!parent which=…}: parents with at least one child matching
    * `childPred` — a higher-order `exists` over the nested block, no
    * query-time join or shuffle. */
  def parentsOfChildren(nested: DataFrame, childPred: Column => Column): DataFrame =
    nested.filter(exists(col("children"), childPred))

  /** {!child of=…}: the children of parents matching `parentPred`. */
  def childrenOfParents(nested: DataFrame, parentPred: Column): DataFrame =
    nested.filter(parentPred)
      .select(explode(col("children")).as("child"))
      .select(col("child.*"))
}
