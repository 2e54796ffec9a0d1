package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph traversal streams — the reference's breadth-first graph
  * expressions re-expressed as iterative distributed equi-joins
  * [U solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/
  * GatherNodesStream.java, ShortestPathStream.java].
  *
  * Shape for scale: every hop is one equi-join of the (small-ish)
  * frontier against the edge table on `src`. The edge table is
  * hash-partitioned on `src` ONCE and persisted — subsequent hops
  * reuse that partitioning, so each iteration shuffles only the
  * frontier, never the edges (at 100 TB: a bucketed edge table makes
  * even the first shuffle free). Visited-set subtraction is a
  * distributed left-anti join — the visited set is never collected.
  * Each frontier is materialized (persist + count) so the iterative
  * plan does not re-execute prior hops; depth is bounded by
  * `maxDepth`, mirroring the reference's mandatory maxDepth knob.
  */
object GraphStreams {

  /** One traversal hop (GatherNodesStream): expand `frontier` across
    * `edges`, emitting each distinct destination node with the number
    * of distinct walks that reach it (the reference's count(*) gather
    * metric). `frontier` carries (node, paths); pass paths=1 seeds for
    * the first hop. Nest calls for multi-hop gathers, exactly like
    * nested nodes() expressions. */
  def gatherNodes(edges: DataFrame, frontier: DataFrame): DataFrame =
    // explicit aliases: nested gathers walk the SAME edge frame, which
    // would make bare column refs ambiguous self-join attributes
    frontier.select(col("node"), col("paths")).as("f")
      .join(edges.as("g"), col("f.node") === col("g.src"))
      .groupBy(col("g.dst").as("node"))
      .agg(sum(col("f.paths")).as("paths"))

  /** Seed frame for gatherNodes: one path to each seed node. */
  def seeds(nodes: DataFrame, nodeCol: Column): DataFrame =
    nodes.select(nodeCol.as("node")).distinct()
      .withColumn("paths", lit(1L))

  /** Breadth-first minimum distances from `seed` over `edges`
    * (src, dst), bounded by `maxDepth`: returns (node, dist) for every
    * node whose shortest walk from the seed is ≤ maxDepth, seed
    * included at dist 0. BFS level = minimum distance by construction
    * (a node joins the visited set the first level it is reached and
    * is anti-joined away afterwards). Driver coordination is one
    * isEmpty probe per level — Pregel-style, ≤ maxDepth rounds. */
  def shortestDistances(edges: DataFrame, seed: String, maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val scratch = scala.collection.mutable.ArrayBuffer[DataFrame](e)
    var visited = Seq((seed, 0)).toDF("node", "dist")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = visited
    var d = 0
    while (d < maxDepth && !frontier.isEmpty) {
      d += 1
      val dd = d
      // explicit aliases: after hop 1 the frontier's lineage contains
      // the edge frame itself, so bare column refs are ambiguous
      val next = frontier.select(col("node")).as("f")
        .join(e.as("g"), col("f.node") === col("g.src"))
        .select(col("g.dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(dd))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize: later hops must not re-run this one
      scratch += next
      scratch += visited
      visited = visited.union(next)
        .persist(StorageLevel.MEMORY_AND_DISK)
      frontier = next
    }
    // materialize the result, then release every intermediate level —
    // repeated traversals in one application must not accumulate
    // superseded frontier/visited blocks for the JVM lifetime (eviction
    // would only cost a lineage recompute, but the storage leak evicts
    // USEFUL cache). The returned frame stays persisted for the caller.
    visited.count()
    scratch.foreach(_.unpersist(blocking = false))
    visited
  }

  /** BFS with parent tracking + backward reconstruction
    * (ShortestPathStream): ONE deterministic shortest path `from`→`to`
    * (ties broken by minimum parent node — the reference emits every
    * shortest path, which is exponential in the worst case; we pin one
    * and document the departure). Returns (step, node) rows, step 0 =
    * `from`; empty frame when `to` is unreachable within `maxDepth`.
    * Backtracking collects ONE parent row per step — ≤ maxDepth
    * single-row driver fetches, never a frontier collect. */
  def shortestPath(edges: DataFrame, from: String, to: String,
                   maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val scratch = scala.collection.mutable.ArrayBuffer[DataFrame](e)
    var visited = Seq((from, 0, "")).toDF("node", "dist", "parent")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = visited
    var d = 0
    var found = from == to
    while (d < maxDepth && !found && !frontier.isEmpty) {
      d += 1
      val dd = d
      val next = frontier.select(col("node")).as("f")
        .join(e.as("g"), col("f.node") === col("g.src"))
        .groupBy(col("g.dst").as("node"))
        .agg(min(col("g.src")).as("parent"))
        .join(visited, Seq("node"), "left_anti")
        .select(col("node"), lit(dd).as("dist"), col("parent"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      scratch += next
      scratch += visited
      visited = visited.union(next)
        .persist(StorageLevel.MEMORY_AND_DISK)
      frontier = next
      found = !next.filter(col("node") === to).isEmpty
    }
    try {
      if (!found && from != to)
        return Seq.empty[(Int, String)].toDF("step", "node")
      // backtrack to..from: one single-row lookup per step
      val steps = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
      var cur = to
      var dist = visited.filter(col("node") === cur).select("dist")
        .head().getInt(0)
      steps += ((dist, cur))
      while (dist > 0) {
        cur = visited.filter(col("node") === cur && col("dist") === dist)
          .select("parent").head().getString(0)
        dist -= 1
        steps += ((dist, cur))
      }
      steps.sortBy(_._1).toSeq.toDF("step", "node")
    } finally {
      // the path is on the driver — release every BFS level and the
      // repartitioned edge copy before returning
      scratch.foreach(_.unpersist(blocking = false))
      visited.unpersist(blocking = false)
    }
  }
}
