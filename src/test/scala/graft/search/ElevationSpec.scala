package graft.search

import graft.SparkSpec

/** Query elevation: pin order, exclusion, organic order preservation. */
class ElevationSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private def hits = {
    import spark.implicits._
    Seq((1, 10L), (2, 20L), (3, 30L), (4, 40L)).toDF("rank", "doc_id")
  }

  test("pinned ids lead in configured order; organic keeps relative order") {
    val out = Elevation.elevate(hits, Seq(30L, 99L)).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    // 99 was not an organic hit — still pinned (Solr forceElevation shape)
    assert(out === Seq((1, 30L), (2, 99L), (3, 10L), (4, 20L), (5, 40L)))
  }

  test("excluded ids are dropped; exclusion-only works") {
    val out = Elevation.elevate(hits, Nil, Seq(20L)).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(out === Seq((1, 10L), (2, 30L), (3, 40L)))
  }

  test("pinning an already-top doc is a no-op on membership") {
    val out = Elevation.elevate(hits, Seq(10L)).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(out === Seq((1, 10L), (2, 20L), (3, 30L), (4, 40L)))
    intercept[IllegalArgumentException] {
      Elevation.elevate(hits, Nil, Nil)
    }
  }

  test("k trims the page; exclusion backfills from overfetched hits") {
    // caller overfetched 4 hits for a page of 3: excluding one organic
    // hit still yields a full page
    val out = Elevation.elevate(hits, Seq(99L), Seq(20L), k = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(out === Seq((1, 99L), (2, 10L), (3, 30L)))
    // misconfigurations fail loudly
    intercept[IllegalArgumentException] {
      Elevation.elevate(hits, Seq(7L, 7L))
    }
    intercept[IllegalArgumentException] {
      Elevation.elevate(hits, Seq(7L), Seq(7L))
    }
  }
}
