package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over a near-duplicate pair set —
  * the step that turns pairwise near-dup EDGES into transitive
  * CLUSTERS with one representative per cluster (the form a
  * training-data dedup pipeline actually consumes: keep one doc per
  * component, drop the rest).
  *
  * Algorithm: alternating Large-Star / Small-Star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
  * MapReduce and Beyond", SoCC'14). Each round is two hash-shuffle
  * aggregations over the edge list; the edge set converges to stars
  * (node → component-minimum) in O(log² n) rounds — in practice a
  * handful, because near-dup components are shallow. Nothing ever
  * moves a whole component into one task (the failure mode of the
  * naive "collect the group and union-find it" approach), so the
  * 10^8-copies-of-one-boilerplate-page corpus degrades gracefully:
  * per-round work is bounded by the per-node NEIGHBOR list, which both
  * star operations actively shrink.
  *
  * Scale notes (100 TB story):
  *  - the iteration materializes each round's edge set and cuts plan
  *    lineage (an iterative DataFrame loop otherwise compounds the
  *    logical plan exponentially); at cluster scale pass a reliable
  *    `checkpointDir` so a lost executor replays one round, not the
  *    whole history — `localCheckpoint` is the single-box default;
  *  - convergence is detected by an O(1)-to-driver checksum
  *    (count + sum of row hashes), never by collecting edges;
  *  - input edges are deduplicated and canonicalized (u > v) first, so
  *    rounds operate on the minimal undirected edge set.
  */
object Components {

  /** (id, component) for every node in `nodes` (single column `id`),
    * where `component` is the smallest node id transitively reachable
    * through `pairs` (columns `a`, `b`; isolated nodes map to
    * themselves). Deterministic — component ids are stable across
    * cluster sizes and reruns. */
  def connectedComponents(pairs: DataFrame, nodes: DataFrame,
                          maxIter: Int = 50,
                          checkpointDir: Option[String] = None): DataFrame = {
    val spark = pairs.sparkSession

    // Reliable materialization is a parquet round-robin under
    // checkpointDir, NOT Dataset.checkpoint: reliable checkpoint files
    // are never cleaned during the job (unpersist is a no-op for them),
    // so O(log² n) rounds would hold rounds × |edges| on the store.
    // Here round i's write consumes round i−1's frame, after which
    // round i−1's files are deleted — storage is bounded by TWO rounds'
    // edges, and only the FINAL round's files (which back the returned
    // frame) outlive the call; the caller owns the directory.
    val runTag = java.util.UUID.randomUUID().toString.take(8)
    var roundSeq = 0
    var prevPath: Option[String] = None
    def materialize(df: DataFrame): (DataFrame, (Long, String)) = {
      val cut = checkpointDir match {
        case Some(dir) =>
          val path = s"$dir/cc-$runTag-r$roundSeq"
          roundSeq += 1
          df.write.mode("overwrite").parquet(path)
          val back = spark.read.parquet(path)
          prevPath.foreach { old =>
            val hp = new org.apache.hadoop.fs.Path(old)
            hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(hp, true)
          }
          prevPath = Some(path)
          back
        case None => df.localCheckpoint(eager = true)
      }
      // hash sum in decimal(38,0): 64-bit row hashes summed as Long
      // would overflow under ANSI arithmetic
      val row = cut.agg(
        count(lit(1)).cast("long"),
        coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)"))).head()
      (cut, (row.getLong(0), String.valueOf(row.getDecimal(1))))
    }

    // canonical undirected edge set: u > v, self-loops dropped
    var e = pairs
      .select(col("a").cast("long").as("x"), col("b").cast("long").as("y"))
      .filter(col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("u"),
        least(col("x"), col("y")).as("v"))
      .distinct()
    val eMat = materialize(e)
    e = eMat._1
    var sig: (Long, String) = eMat._2

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // ---- Large-Star: every node u sees its FULL neighborhood; its
      // strictly-larger neighbors re-point at m = min(Γ(u) ∪ {u}).
      val bidir = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mLarge = bidir.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val ls = bidir.join(mLarge, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")) // v > u ≥ m ⇒ canonical
        .filter(col("u") =!= col("v"))
        .distinct()

      // ---- Small-Star: edges point at their larger endpoint (already
      // canonical u > v); u's ≤-neighbors and u itself re-point at the
      // neighborhood minimum m.
      val mSmall = ls.groupBy("u").agg(min(col("v")).as("m"))
      val ss = ls.join(mSmall, "u")
        .select(
          when(col("v") === col("m"), col("u")).otherwise(col("v")).as("u"),
          col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()

      val mat = materialize(ss)
      e.unpersist()
      e = mat._1
      converged = mat._2 == sig
      sig = mat._2
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")

    // star form: every non-root appears exactly once as (u → root)
    val out = nodes
      .select(col("id").cast("long").as("id"))
      .join(e.select(col("u").as("id"), col("v").as("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
    out
  }

  /** Near-dup clusters over `documents(doc_id, text)`: exact n-gram
    * Jaccard edges at `threshold`, components over them, one row per
    * doc: (doc_id, component). A doc survives dedup iff
    * doc_id == component. */
  def nearDupComponents(documents: DataFrame, n: Int = 3,
                        threshold: Double = 0.5): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(documents, n, threshold)
    val nodes = documents.select(col("doc_id").cast("long").as("id"))
    connectedComponents(pairs, nodes)
      .withColumnRenamed("id", "doc_id")
  }

  /** In-memory union-find oracle for the randomized spec. */
  private[graft] def bruteComponents(pairs: Seq[(Long, Long)],
                                     nodes: Seq[Long]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    nodes.foreach(n => parent.getOrElseUpdate(n, n))
    pairs.foreach { case (a, b) => union(a, b) }
    nodes.map(n => n -> find(n)).toMap
  }
}
