package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`embeddings(vec_id, embedding: array<float>, label)`).
  *
  * - `bruteTopK` is the exact baseline: broadcast the (small) query set,
  *   one pass over the corpus, per-query top-k via window — the
  *   distributed plan has NO shuffle of the big side beyond the final
  *   per-query top-k (TakeOrdered-style).
  * - `lshTopK` is the scale path: signed-random-projection buckets
  *   (deterministic hyperplanes), candidates = same-bucket rows, exact
  *   re-rank inside buckets. At 100 TB the bucket join replaces the
  *   all-pairs scan.
  * Dot products use built-in higher-order functions (zip_with +
  * aggregate) — codegen, no UDF.
  */
object Ann {

  /** cosine(a, b) as a Column over two array<float/double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** Exact cosine top-k: for each query vector (queries is SMALL —
    * broadcast), the k nearest corpus vectors.
    * Output: (q_id, rank, vec_id). */
  def bruteTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = embeddings.as("e").crossJoin(broadcast(queries.as("q")))
      .withColumn("cos", cosine(col("e.embedding"), col("q.q_embedding")))
    joined
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q.q_id")).orderBy(desc("cos"), asc("e.vec_id"))))
      .filter(col("rank") <= k)
      .select(col("q.q_id").as("q_id"), col("rank").cast("int").as("rank"),
        col("e.vec_id").as("vec_id"))
      .orderBy("q_id", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dimension d) — a hash folded to [-1, 1]; no runtime RNG so bucket
    * assignment is stable across cluster sizes and resumes. */
  private def planeComponent(p: Int, d: Int): Double = {
    var h = 0x9E3779B97F4A7C15L * (p * 257 + d + 1)
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
    (h.toDouble / Long.MaxValue.toDouble)
  }

  /** Signed-random-projection bucket id over `numPlanes` hyperplanes of
    * dimension `dim`. Plane weights are driver-computed deterministic
    * literals broadcast inside the plan — the per-row work is pure
    * zip_with/aggregate (codegen). */
  def srpBucket(emb: Column, numPlanes: Int, dim: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      val weights = typedLit((0 until dim).map(d => planeComponent(p, d)).toArray)
      val dot = aggregate(zip_with(emb, weights, (x, w) => x * w),
        lit(0.0d), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: exact re-rank within shared SRP buckets.
    * Approximate — recall measured against bruteTopK in tests. */
  def lshTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
              dim: Int, numPlanes: Int = 8): DataFrame = {
    val e = embeddings.withColumn("bucket", srpBucket(col("embedding"), numPlanes, dim))
    val q = queries.withColumn("bucket", srpBucket(col("q_embedding"), numPlanes, dim))
    val joined = e.as("e").join(broadcast(q.as("q")), "bucket")
      .withColumn("cos", cosine(col("e.embedding"), col("q.q_embedding")))
    joined
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q.q_id")).orderBy(desc("cos"), asc("e.vec_id"))))
      .filter(col("rank") <= k)
      .select(col("q.q_id").as("q_id"), col("rank").cast("int").as("rank"),
        col("e.vec_id").as("vec_id"))
      .orderBy("q_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold)
    * via SRP bucketing + in-bucket verification. */
  def cosineNearDups(embeddings: DataFrame, threshold: Double,
                     dim: Int, numPlanes: Int = 6): DataFrame = {
    val e = embeddings.withColumn("bucket", srpBucket(col("embedding"), numPlanes, dim))
    e.as("l").join(e.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .withColumn("cos", cosine(col("l.embedding"), col("r.embedding")))
      .filter(col("cos") >= threshold)
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"), col("cos"))
      .orderBy("a", "b")
  }
}
