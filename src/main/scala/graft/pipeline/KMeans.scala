package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-means clustering over the embedding column — the reference's
  * streaming-ML `kmeans()` expression / clustering contrib
  * [U solrj io/stream/KmeansEvaluator (solr ml streaming), solr
  * contrib clustering; SURVEY.md P2 "clustering"].
  *
  * Determinism at cluster scale is the design driver: floating-point
  * centroid sums depend on partition/merge order, so a 1000-executor
  * run would train different centroids than an 8-thread run. This
  * implementation works in FIXED-POINT (value · 2^20 as Long):
  * distances and centroid sums are exact integer arithmetic —
  * associative/commutative, so every cluster size and every resume
  * produces bit-identical clusters (same property the deterministic
  * SRP hyperplanes give the LSH path).
  *
  *  - init: the k lowest vec_ids' vectors (deterministic seed)
  *  - assign: argmin of Σ(x_i − c_i)² over k broadcast centroid
  *    literals; ties → lowest cluster id. Pure codegen Column ops
  *    (zip_with + aggregate) — no UDF, no shuffle for assignment.
  *  - update: per-(cluster, dim) Long sums via posexplode + partial
  *    aggregation (one shuffle of k·d rows), centroid = floorDiv(sum,
  *    count). Empty clusters keep their previous centroid.
  *  - driver state is O(k·d) — never O(rows).
  *
  * Long-overflow headroom: |fx| ≤ 2^21 for inputs in [-2, 2], so a
  * squared-distance sum over d ≤ 2^20 dims stays < 2^63.
  */
object KMeans {

  val Scale = 1L << 20

  /** Fixed-point view of one embedding column. */
  def fxCol(emb: Column): Column =
    transform(emb, v => round(v.cast("double") * Scale).cast("long"))

  /** Fixed-point view: (vec_id, fx array<long>). */
  def fixedPoint(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), fxCol(col("embedding")).as("fx"))

  /** Exact integer squared L2 from a fixed-point vector column to one
    * centroid literal. */
  def distTo(cent: Array[Long], fx: Column): Column =
    aggregate(
      zip_with(fx, typedLit(cent.toSeq),
        (x, c) => (x - c) * (x - c)),
      lit(0L), (acc, x) => acc + x)

  /** Assignment column: struct-lexicographic least over (dist, id) —
    * ties resolve to the lowest cluster id, over an EXPLICIT
    * fixed-point vector column. Shared with the IVF path
    * (Ann.ivfTopK). */
  def assignCol(cents: Seq[Array[Long]], fx: Column): Column =
    least(cents.zipWithIndex.map { case (c, i) =>
      struct(distTo(c, fx).as("d"), lit(i).as("c"))
    }: _*).getField("c")

  private def assignCol(cents: Seq[Array[Long]]): Column =
    assignCol(cents, col("fx"))

  /** Run `iters` refinement rounds from the deterministic init; return
    * (assignments (vec_id, cluster), centroids (cluster, fx)). */
  def fit(embeddings: DataFrame, k: Int, iters: Int): (DataFrame, Seq[Array[Long]]) = {
    val fx = fixedPoint(embeddings)
    // deterministic seed: k lowest vec_ids (tiny bounded collect)
    var cents: Seq[Array[Long]] = fx.orderBy("vec_id").limit(k).collect()
      .map(_.getSeq[Long](1).toArray).toSeq
    require(cents.length == k, s"need ≥ $k vectors to seed $k clusters")
    for (_ <- 1 to iters) {
      val assigned = fx.withColumn("cluster", assignCol(cents))
      // per-(cluster, dim) exact Long sums: partial agg map-side, then
      // a k·d-row shuffle — independent of corpus size
      val sums = assigned
        .select(col("cluster"), posexplode(col("fx")).as(Seq("dim", "v")))
        .groupBy("cluster", "dim")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, c) =>
        byCluster.get(c) match {
          case None => old // empty cluster keeps its centroid
          case Some(rows) =>
            val d = old.length
            val next = new Array[Long](d)
            rows.foreach { r =>
              next(r.getInt(1)) = Math.floorDiv(r.getLong(2), r.getLong(3))
            }
            next
        }
      }
    }
    (fx.withColumn("cluster", assignCol(cents))
      .select(col("vec_id"), col("cluster").cast("int").as("cluster"))
      .orderBy("vec_id"),
      cents)
  }
}
