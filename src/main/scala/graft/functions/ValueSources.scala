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
    "add" -> (args => args.reduce(_ + _)), // Solr registry alias of sum
    "product" -> (args => args.reduce(_ * _)),
    "mul" -> (args => args.reduce(_ * _)), // Solr registry alias of product
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
    "concat" -> (args => concat(args: _*)),
    // ---- trig / hyperbolic / rounding long tail (same-shape rows of
    // the Solr registry; all pure codegen built-ins) ----
    "asin" -> uni(asin), "acos" -> uni(acos), "atan" -> uni(atan),
    "atan2" -> bin(atan2),
    "sinh" -> uni(sinh), "cosh" -> uni(cosh), "tanh" -> uni(tanh),
    "hypot" -> bin(hypot),
    "deg" -> uni(degrees), "rad" -> uni(radians),
    "e" -> { case Seq() => lit(math.E)
             case args => sys.error(s"e() takes no args, got ${args.length}") },
    "pi" -> { case Seq() => lit(math.Pi)
              case args => sys.error(s"pi() takes no args, got ${args.length}") },
    // ---- comparison + boolean functions (Solr 7+ gt/lt/and/or/...;
    // booleans compose with `if`) ----
    "gt" -> bin(_ > _), "gte" -> bin(_ >= _),
    "lt" -> bin(_ < _), "lte" -> bin(_ <= _),
    "eq" -> bin(_ === _),
    "not" -> uni(!_),
    "and" -> (args => args.reduce(_ && _)),
    "or" -> (args => args.reduce(_ || _)),
    "xor" -> bin(_ =!= _),
    // ---- vector distances (DualFloatFunction family): args = the two
    // points interleaved as (x1..xn, y1..yn) ----
    "sqedist" -> (args => {
      require(args.length % 2 == 0 && args.nonEmpty,
        s"sqedist needs an even arg count, got ${args.length}")
      val (xs, ys) = args.splitAt(args.length / 2)
      xs.zip(ys).map { case (x, y) => (x - y) * (x - y) }.reduce(_ + _)
    }),
    // field(x) — the identity passthrough (Solr FieldValueSource); the
    // multi-valued selector form lives in `fieldSelect` below
    "field" -> uni(identity),
    // literal('x') / top(f) — passthroughs: the caller supplies the
    // literal as a Column already, and `top` (read stats from the
    // top-level reader) is the identity here because every column IS
    // top-level — there are no per-segment leaf readers to differ from
    "literal" -> uni(identity),
    "top" -> uni(identity),
    "true" -> { case Seq() => lit(true)
                case args => sys.error(s"true() takes no args, got ${args.length}") },
    "false" -> { case Seq() => lit(false)
                 case args => sys.error(s"false() takes no args, got ${args.length}") },
    // vector(a,b,...) — the multi-valued constructor (Solr VectorValueSource)
    "vector" -> (args => array(args: _*)),
    // hsin(radius, lat1, lon1, lat2, lon2) — haversine on a caller-
    // supplied sphere radius, coordinates in RADIANS (the Solr
    // HaversineFunction's convert=false form; geodist above is the
    // degrees/earth-radius convenience) [U solr/core/.../search/
    // function/distance/HaversineFunction.java]
    "hsin" -> { case Seq(r, lat1, lon1, lat2, lon2) =>
      val h = pow(sin((lat2 - lat1) / 2.0), 2.0) +
        cos(lat1) * cos(lat2) * pow(sin((lon2 - lon1) / 2.0), 2.0)
      lit(2.0) * r * asin(sqrt(h))
      case args => sys.error(s"hsin takes 5 args, got ${args.length}") },
    // payload(field, key[, default]) — keyed per-doc payload lookup
    // with a default for absent keys [U solr PayloadScoreQParserPlugin /
    // FloatPayloadValueSource]: the payload store is a map-typed column
    "payload" -> { case Seq(m, k) => element_at(m, k)
                   case Seq(m, k, d) => coalesce(element_at(m, k), d)
                   case args => sys.error(s"payload takes 2-3 args, got ${args.length}") })
    // NOTE: `ord` is deliberately NOT a Column in this registry — a
    // column-level ordinal would be a no-partition Window (the corpus
    // through one task). Use `ValueSources.ord(df, field)` below.
    // Deliberately excluded Solr registry rows: `threadid`/`sleep`
    // (debug utilities with no distributed meaning), `testfunc` (test
    // scaffolding), `agg_*` (the JSON-facet aggregates — they live in
    // the facet surface, not per-row functions), `childfield` (block
    // join scoring detail — BlockJoin.scala covers the operator), and
    // `geohash`/`ghhsin` (geohash-string encode; the distance semantics
    // are covered by geodist/hsin over lat/lon directly).

  /** Look up + apply a registered function. */
  def fn(name: String, args: Column*): Column =
    registry.getOrElse(name, sys.error(s"unknown function query: $name"))(args.toSeq)

  /** `ord(field)` — the global ordinal of the field VALUE (Solr's
    * OrdFieldSource reads docvalues ordinals). Ordinals are a property
    * of the value DICTIONARY: collect the distinct values (bounded by
    * cardinality, never the corpus), rank them ON THE DRIVER and
    * broadcast-join the tiny (value → ordinal) table back — no Window
    * operator anywhere (a no-partition Window would single-task even
    * the dictionary and spam the log at serving time). Ordinals are
    * 1-based over the present (non-null) values; a null field value
    * gets a null ordinal (the docvalues-missing case). Appends
    * `<field>_ord`. */
  def ord(df: org.apache.spark.sql.DataFrame, field: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val values = df.select(col(field).cast("string").as("__v"))
      .filter(col("__v").isNotNull).distinct()
      .as[String].collect().sorted
    val dict = values.zipWithIndex.map { case (v, i) => (v, i + 1) }.toSeq
      .toDF("__v", s"${field}_ord")
    df.join(broadcast(dict), df(field).cast("string") === dict("__v"), "left")
      .drop("__v")
  }

  /** `scale(f, targetMin, targetMax)` given the field's global
    * (min, max) — min-max rescale, the Solr ScaleFloatFunction. */
  def scale(f: Column, globalMin: Double, globalMax: Double,
            targetMin: Double, targetMax: Double): Column =
    if (globalMax == globalMin) lit(targetMin)
    else (f - globalMin) / (globalMax - globalMin) *
      (targetMax - targetMin) + targetMin

  /** `dist(p, x1..xn, y1..yn)` — Minkowski p-norm distance between two
    * points (Solr VectorDistanceFunction). p is a literal in the Solr
    * syntax, so it is a plain Double here; p=0 counts differing
    * dimensions (sparseness), p=∞ is Chebyshev. */
  def dist(p: Double, xs: Seq[Column], ys: Seq[Column]): Column = {
    require(xs.length == ys.length && xs.nonEmpty, "dist: dimension mismatch")
    val diffs = xs.zip(ys).map { case (x, y) => abs(x - y) }
    if (p == 0.0) diffs.map(d => when(d =!= 0.0, 1.0).otherwise(0.0)).reduce(_ + _)
    else if (p.isPosInfinity) greatest(diffs: _*)
    else if (p == 1.0) diffs.reduce(_ + _)
    else if (p == 2.0) sqrt(diffs.map(d => d * d).reduce(_ + _))
    else pow(diffs.map(pow(_, p)).reduce(_ + _), 1.0 / p)
  }

  /** Multi-valued field selector — `field(name, min|max|first|last)`
    * over an array-typed column [U solr/core/.../schema/FieldType
    * #getSingleValueSource, org.apache.lucene.search.SortedNumericSelector]:
    * collapses a multiValued field to one value per doc. Pure built-ins
    * (codegen). */
  def fieldSelect(c: Column, selector: String): Column = selector match {
    case "min" => array_min(c)
    case "max" => array_max(c)
    case "first" => element_at(c, 1)
    // 0-based `get`, not element_at(c, -1): ElementAt's codegen emits a
    // reference to an undeclared null flag when the resolved index lands
    // on a non-nullable array child (janino "isNull is not an rvalue"),
    // knocking the whole enclosing projection out of whole-stage
    // codegen; `get` is null-safe on empty arrays too
    case "last" => get(c, size(c) - 1)
    case other => sys.error(s"unknown multi-value selector: $other")
  }

  /** `currency(amount, fromCode, toCode)` against a caller-supplied
    * rate table [U solr/core/.../schema/CurrencyFieldType +
    * ExchangeRateProvider]: rates map currency code → units of `to`
    * per 1 unit; unknown codes convert to null (the provider-miss
    * case). The code dispatch is a deterministic when-chain (sorted
    * fold), all codegen. */
  def currency(amount: Column, from: Column, to: String,
               rates: Map[String, Double]): Column = {
    val withTo = rates + (to -> 1.0)
    val rate = withTo.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("double")) { case (acc, (code, r)) =>
        when(from === lit(code), lit(r)).otherwise(acc)
      }
    amount * rate
  }

  /** `rord(field)` — reverse ordinal (Solr ReverseOrdFieldSource):
    * cardinality + 1 − ord, from the same bounded dictionary rank as
    * `ord` (never a corpus-wide Window). Appends `<field>_rord`. */
  def rord(df: org.apache.spark.sql.DataFrame, field: String): org.apache.spark.sql.DataFrame = {
    val withOrd = ord(df, field)
    // dictionary cardinality = the max ordinal; the agg is over the
    // already-ranked broadcast column (null when the field is all-null
    // — then every rord is null too, matching ord)
    val mx = withOrd.agg(max(col(s"${field}_ord"))).head()
    val card = if (mx.isNullAt(0)) 0 else mx.getInt(0)
    withOrd.withColumn(s"${field}_rord", lit(card + 1) - col(s"${field}_ord"))
  }
}

/** Index-statistic function queries — the Solr relevance ValueSources
  * (docfreq/ttf/idf/numdocs/maxdoc/sumtotaltermfreq/norm/termfreq)
  * [U solr ValueSourceParser "docfreq","ttf","idf","norm","termfreq";
  * lucene/queries/.../function/valuesource/TermFreqValueSource.java].
  * Per-TERM statistics are scalars: one bounded driver lookup per
  * DISTINCT query term (the MLT df-lookup shape — never a corpus job),
  * memoized per instance. `termfreq` is per-document and therefore a
  * FRAME to left-join (coalesce 0 for non-matching docs), not a scalar.
  * `norm(field)` is the stored quantized length — the docs table's own
  * `dlq` column (SmallFloat round-trip of dl), exposed for symmetry. */
final class IndexFunctions(idx: graft.index.IndexView) {
  import org.apache.spark.sql.DataFrame

  private val cache =
    scala.collection.mutable.HashMap.empty[String, (Long, Long)]
  private def stats(term: String): (Long, Long) =
    cache.getOrElseUpdate(term,
      idx.termStats.filter(col("term") === term).select("df", "ttf")
        .collect().headOption
        .map(r => (r.getLong(0), r.getLong(1))).getOrElse((0L, 0L)))

  def docfreq(term: String): Column = lit(stats(term)._1)
  def totaltermfreq(term: String): Column = lit(stats(term)._2)
  def sumtotaltermfreq: Column = lit(idx.stats.sumTotalTermFreq)
  def numdocs: Column = lit(idx.stats.docCount)
  def maxdoc: Column = lit(idx.stats.docCount)

  /** BM25 idf — the same arithmetic as the scorer path. */
  def idf(term: String): Column = {
    val df = stats(term)._1.toDouble
    lit(math.log(1.0 + (idx.stats.docCount - df + 0.5) / (df + 0.5)))
  }
}
