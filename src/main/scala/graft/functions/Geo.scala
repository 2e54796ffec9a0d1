package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spatial predicates as pure Column expressions (codegen — no UDF):
  * the LatLonPoint query family's filter semantics re-expressed over
  * lat/lon Columns [U lucene/core/.../document/LatLonPoint.java
  * #newBoxQuery/#newPolygonQuery; lucene/core/.../geo/Polygon.java;
  * solr SpatialFilterQParser {!bbox}]. The haversine distance twin
  * (geodist) lives in ValueSources. */
object Geo {

  /** Bounding-box predicate: two range comparisons — fully
    * pushdown-able into a parquet scan when lat/lon are stored columns.
    * `lonMin > lonMax` means the box crosses the dateline (the
    * reference's box semantics): the longitude test becomes a
    * disjunction of the two half-boxes. */
  def bboxPred(lat: Column, lon: Column,
               latMin: Double, latMax: Double,
               lonMin: Double, lonMax: Double): Column = {
    val latOk = lat >= lit(latMin) && lat <= lit(latMax)
    val lonOk =
      if (lonMin <= lonMax) lon >= lit(lonMin) && lon <= lit(lonMax)
      else lon >= lit(lonMin) || lon <= lit(lonMax)
    latOk && lonOk
  }

  /** Even-odd ray casting [U lucene/core/.../geo/GeoUtils — the
    * crossing-count containment test]: cast a ray eastward from the
    * point; an odd number of edge crossings means inside. The fold over
    * the polygon's edges is a static `aggregate` over an array-of-
    * struct literal — whole-stage codegen, one expression per query.
    * Points exactly ON an edge follow the raw comparison outcomes
    * (callers choose vertices off the data grid, as the gate does). */
  def pointInPolygon(lat: Column, lon: Column,
                     poly: Seq[(Double, Double)]): Column = {
    require(poly.length >= 3, s"polygon needs >= 3 vertices: $poly")
    val edges = poly.indices.map { i =>
      val (y1, x1) = poly(i)
      val (y2, x2) = poly((i + 1) % poly.length)
      struct(lit(y1).as("y1"), lit(x1).as("x1"),
        lit(y2).as("y2"), lit(x2).as("x2"))
    }
    val crossings = aggregate(array(edges: _*), lit(0), (acc, e) => {
      val y1 = e.getField("y1"); val x1 = e.getField("x1")
      val y2 = e.getField("y2"); val x2 = e.getField("x2")
      acc + when(((y1 > lat) =!= (y2 > lat)) &&
        (lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1), lit(1))
        .otherwise(lit(0))
    })
    crossings % lit(2) === lit(1)
  }
}
