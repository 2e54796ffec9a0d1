package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Large-star/small-star connected components vs an in-memory
  * union-find oracle, plus the structural cases that break naive
  * label propagation. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(pairs: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] = {
    val p = pairs.toDF("a", "b")
    val n = nodes.toDF("id")
    Components.connectedComponents(p, n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain transitivity: a path collapses to one component") {
    // 0-1, 1-2, ..., 8-9: worst case for per-round propagation depth
    val pairs = (0L until 9L).map(i => (i, i + 1))
    val got = run(pairs, 0L to 9L)
    assert(got.values.toSet == Set(0L))
  }

  test("isolated nodes map to themselves") {
    val got = run(Seq((1L, 2L)), Seq(1L, 2L, 7L, 9L))
    assert(got(7L) == 7L && got(9L) == 9L && got(1L) == 1L && got(2L) == 1L)
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val got = run(Seq((3L, 3L), (1L, 2L), (2L, 1L), (1L, 2L)), Seq(1L, 2L, 3L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("randomized graphs match union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 8) {
      val n = 30 + rnd.nextInt(50)
      val nodes = (0L until n.toLong).toSeq
      val nEdges = rnd.nextInt(2 * n)
      val pairs = Seq.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val want = Components.bruteComponents(pairs, nodes)
      val got = run(pairs, nodes)
      assert(got == want, s"trial $trial (n=$n, e=$nEdges)")
    }
  }

  test("star graph converges (hub larger than all leaves)") {
    val pairs = (0L until 20L).map(i => (99L, i))
    val got = run(pairs, (0L until 20L) :+ 99L)
    assert(got.values.toSet == Set(0L))
  }

  test("reliable checkpointDir mode: same result, only the last round's files survive") {
    val dir = java.nio.file.Files.createTempDirectory("ccckpt").toString
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("a", "b")
    val nodes = (0L to 5L).toDF("id")
    val got = Components
      .connectedComponents(pairs, nodes, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 5L))
    // prior rounds were deleted as soon as the next one materialized
    val rounds = new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("cc-"))
    assert(rounds.length == 1, rounds.map(_.getName).mkString(","))
  }

  test("nearDupComponents: exact copies + a bridge doc cluster together") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact copy of 1
      (3L, "alpha beta gamma delta epsilon eta"),  // near 1/2
      (4L, "totally different words here now")
    ).toDF("doc_id", "text")
    val got = Components.nearDupComponents(docs, n = 3, threshold = 0.4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L && got(4L) == 4L)
  }
}
