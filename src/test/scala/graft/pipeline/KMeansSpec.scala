package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixed-point k-means: driver-reference identity + partition-layout
  * invariance (the property floating-point accumulation would lose). */
class KMeansSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Driver-side reference: same algorithm on collected arrays. */
  private def reference(k: Int, iters: Int): Map[Long, Int] = {
    val rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(v =>
          BigDecimal(v.toDouble * KMeans.Scale)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray))
    var cents = rows.take(k).map(_._2.clone())
    def assign(cs: Array[Array[Long]]): Map[Long, Int] =
      rows.map { case (id, fx) =>
        val ds = cs.map(c => fx.zip(c).map { case (x, y) =>
          (x - y) * (x - y) }.sum)
        id -> ds.zipWithIndex.minBy { case (d, i) => (d, i) }._2
      }.toMap
    for (_ <- 1 to iters) {
      val a = assign(cents)
      cents = cents.zipWithIndex.map { case (old, c) =>
        val members = rows.filter(r => a(r._1) == c).map(_._2)
        if (members.isEmpty) old
        else members.head.indices.map { i =>
          Math.floorDiv(members.map(_(i)).sum, members.length.toLong)
        }.toArray
      }
    }
    assign(cents)
  }

  test("kmeans == driver reference; invariant under partition layout") {
    val expected = reference(4, 1)
    Seq(3, 11).foreach { parts =>
      val got = KMeans.fit(emb.repartition(parts), 4, 1)._1.collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === expected, s"parts=$parts")
    }
    // all 4 clusters are populated on this corpus
    assert(expected.values.toSet === Set(0, 1, 2, 3))
  }

  test("kmeans assignment plan has no UDF and no unbounded Window") {
    val (assignments, _) = KMeans.fit(emb, 3, 1)
    val p = assignments.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("UDF("), "UDF in kmeans plan")
    assert(!p.contains("Window"), "Window in kmeans plan")
  }
}
