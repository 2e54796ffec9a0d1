package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Solr function-query surface as a NAMED registry of Column
  * builders — the ValueSourceParser plugin table
  * [U solr/core/src/java/org/apache/solr/search/ValueSourceParser.java,
  * lucene/queries/.../function/; SURVEY.md §2.10]. Each entry maps a
  * Solr function name to the Spark expression that implements it, so a
  * `fl=sum(div(x,y),2)`-style request compiles to pure built-in
  * (codegen'd) Column arithmetic — no UDFs anywhere in the table.
  *
  * `scale(f,min,max)` needs the global min/max of f — in Solr a
  * per-searcher statistics pass; here a tiny agg the caller supplies
  * (see `scale`).
  */
object ValueSources {

  private def uni(f: Column => Column): Seq[Column] => Column = {
    case Seq(a) => f(a)
    case args => sys.error(s"expected 1 arg, got ${args.length}")
  }
  private def bin(f: (Column, Column) => Column): Seq[Column] => Column = {
    case Seq(a, b) => f(a, b)
    case args => sys.error(s"expected 2 args, got ${args.length}")
  }

  /** name → builder. Names and semantics follow the Solr registry:
    * `log` is base-10 (Solr's LogValueSource), `min`/`max` are per-ROW
    * over their args (least/greatest), `sum`/`product` are variadic
    * row-wise, `def` is the default-if-missing function, `map` rewrites
    * a value range to a constant, `ms` is millis between two dates. */
  val registry: Map[String, Seq[Column] => Column] = Map(
    "abs" -> uni(abs),
    "log" -> uni(log10),
    "ln" -> uni(x => log(x)),
    "sqrt" -> uni(sqrt),
    "cbrt" -> uni(cbrt),
    "ceil" -> uni(ceil),
    "floor" -> uni(floor),
    "rint" -> uni(x => bround(x)), // half-even, like Math.rint
    "exp" -> uni(exp),
    "sin" -> uni(sin), "cos" -> uni(cos), "tan" -> uni(tan),
    "pow" -> bin(pow),
    "mod" -> bin(_ % _),
    "div" -> bin(_ / _),
    "sub" -> bin(_ - _),
    "sum" -> (args => args.reduce(_ + _)),
    "product" -> (args => args.reduce(_ * _)),
    "min" -> (args => least(args: _*)),
    "max" -> (args => greatest(args: _*)),
    "if" -> { case Seq(c, t, f) => when(c, t).otherwise(f) },
    "exists" -> uni(_.isNotNull),
    "def" -> (args => coalesce(args: _*)),
    "map" -> { case Seq(x, mn, mx, target) =>
      when(x.between(mn, mx), target).otherwise(x) },
    "ms" -> bin((a, b) => unix_millis(a) - unix_millis(b)),
    "linear" -> { case Seq(x, m, c) => m * x + c },
    "recip" -> { case Seq(x, m, a, b) => a / (m * x + b) },
    // geodist(lat1,lon1,lat2,lon2) — haversine great-circle distance in
    // km (Solr's HaversineConstFunction / geodist() over LatLonPoint
    // [U solr/core/.../search/function/distance/HaversineConstFunction.java,
    // lucene/core/.../document/LatLonPoint.java]; SURVEY.md P2 geo row) —
    // pure codegen Column trig, no UDF
    "geodist" -> { case Seq(lat1, lon1, lat2, lon2) =>
      val r = lit(6371.0087714) // mean earth radius km (GEO_MEAN_RADIUS)
      val dLat = radians(lat2 - lat1) / 2.0
      val dLon = radians(lon2 - lon1) / 2.0
      val h = pow(sin(dLat), 2.0) +
        cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2.0)
      lit(2.0) * r * asin(sqrt(h))
    },
    "strdist" -> bin((a, b) =>
      lit(1.0) - levenshtein(a, b) / greatest(length(a), length(b)).cast("double")),
    "concat" -> (args => concat(args: _*)))
    // NOTE: `ord` is deliberately NOT a Column in this registry — a
    // column-level ordinal would be a no-partition Window (the corpus
    // through one task). Use `ValueSources.ord(df, field)` below.

  /** Look up + apply a registered function. */
  def fn(name: String, args: Column*): Column =
    registry.getOrElse(name, sys.error(s"unknown function query: $name"))(args.toSeq)

  /** `ord(field)` — the global ordinal of the field VALUE (Solr's
    * OrdFieldSource reads docvalues ordinals). Ordinals are a property
    * of the value DICTIONARY, so rank the distinct values (dictionary-
    * sized — the only global sort, bounded by cardinality, never the
    * corpus) and broadcast-join them back; appends `<field>_ord`. */
  def ord(df: org.apache.spark.sql.DataFrame, field: String): org.apache.spark.sql.DataFrame = {
    val dict = df.select(col(field).as("__v")).distinct()
      .withColumn(s"${field}_ord", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("__v"))))
    df.join(broadcast(dict), df(field) === dict("__v"), "left").drop("__v")
  }

  /** `scale(f, targetMin, targetMax)` given the field's global
    * (min, max) — min-max rescale, the Solr ScaleFloatFunction. */
  def scale(f: Column, globalMin: Double, globalMax: Double,
            targetMin: Double, targetMax: Double): Column =
    if (globalMax == globalMin) lit(targetMin)
    else (f - globalMin) / (globalMax - globalMin) *
      (targetMax - targetMin) + targetMin
}
