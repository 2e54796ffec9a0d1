package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GraphStreams: BFS distances vs a driver-side reference, path
  * validity/determinism, gather path-count multiplicities. */
class GraphSpec extends SparkSpec {

  private def edgeDf(es: Seq[(String, String)]) = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  //    a → b → c → f
  //    a → d → c    (two shortest walks a..c)
  //    d → e,  f → g (depth 3 from a), h isolated
  private val g = Seq(
    "a" -> "b", "b" -> "c", "a" -> "d", "d" -> "c",
    "d" -> "e", "c" -> "f", "f" -> "g", "h" -> "h")

  private def driverBfs(es: Seq[(String, String)], seed: String,
                        maxDepth: Int): Map[String, Int] = {
    val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var dist = Map(seed -> 0)
    var frontier = Set(seed)
    for (d <- 1 to maxDepth) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      dist ++= frontier.map(_ -> d)
    }
    dist
  }

  test("shortestDistances == driver BFS at every depth") {
    for (depth <- 0 to 4) {
      val got = GraphStreams.shortestDistances(edgeDf(g), "a", depth)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(got === driverBfs(g, "a", depth), s"depth $depth")
    }
  }

  test("shortestPath: valid edge chain, length == BFS dist, min-parent ties") {
    val path = GraphStreams.shortestPath(edgeDf(g), "a", "f", 5)
      .orderBy("step").collect().map(_.getString(1)).toSeq
    assert(path.length === 4 && path.head === "a" && path.last === "f")
    val eset = g.toSet
    path.sliding(2).foreach { case Seq(x, y) => assert(eset.contains(x -> y)) }
    // two shortest a→c walks (via b and via d); min-parent pins b
    assert(path === Seq("a", "b", "c", "f"))
  }

  test("shortestPath: unreachable and self cases") {
    assert(GraphStreams.shortestPath(edgeDf(g), "a", "h", 6).count() === 0)
    val self = GraphStreams.shortestPath(edgeDf(g), "a", "a", 3)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(self === Seq(0 -> "a"))
  }

  test("gatherNodes: path-count multiplicities across nested hops") {
    // x has two edges into m; m and n both reach z
    val es = edgeDf(Seq("x" -> "m", "x" -> "m", "x" -> "n",
      "m" -> "z", "n" -> "z", "n" -> "w"))
    val s0 = GraphStreams.seeds(edgeDf(Seq("x" -> "ignored")), col("src"))
    val hop1 = GraphStreams.gatherNodes(es, s0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hop1 === Map("m" -> 2L, "n" -> 1L))
    val hop2 = GraphStreams.gatherNodes(es, GraphStreams.gatherNodes(es, s0))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // z: 2 walks via m + 1 via n; w: 1 via n
    assert(hop2 === Map("z" -> 3L, "w" -> 1L))
  }
}
