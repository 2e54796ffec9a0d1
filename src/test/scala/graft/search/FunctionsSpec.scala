package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry
import graft.functions.{IndexFunctions, ValueSources => V}

/** ValueSources long tail: trig/comparison/boolean/vector registry
  * rows, dist p-norms, rord, index-statistic functions, query($q) as a
  * column, and the fuzzy/weighted suggesters. */
class FunctionsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val idx = SparkEntry.index(spark, sfDir)
  private lazy val rel = new RelationalPath(idx)

  test("registry long tail matches scala math row-wise") {
    val df = spark.range(1, 20).select(
      (col("id").cast("double") / 7.0).as("x"),
      (col("id").cast("double") / 3.0 - 2.0).as("y"))
    val rows = df.select(col("x"), col("y"),
      V.fn("atan2", col("y"), col("x")).as("f_atan2"),
      V.fn("hypot", col("x"), col("y")).as("f_hypot"),
      V.fn("tanh", col("x")).as("f_tanh"),
      V.fn("deg", col("x")).as("f_deg"),
      V.fn("sqedist", col("x"), col("y"), lit(0.0), lit(1.0)).as("f_sq"),
      V.fn("if", V.fn("and", V.fn("gt", col("x"), col("y")),
        V.fn("not", V.fn("eq", col("x"), col("y")))), lit(1), lit(0)).as("f_cmp"))
      .collect()
    rows.foreach { r =>
      val (x, y) = (r.getDouble(0), r.getDouble(1))
      assert(r.getDouble(2) === math.atan2(y, x))
      assert(r.getDouble(3) === math.hypot(x, y))
      assert(r.getDouble(4) === math.tanh(x))
      assert(r.getDouble(5) === math.toDegrees(x))
      assert(r.getDouble(6) === (x - 0.0) * (x - 0.0) + (y - 1.0) * (y - 1.0))
      assert(r.getInt(7) === (if (x > y && !(x == y)) 1 else 0))
    }
    assert(df.select(V.fn("pi")).head().getDouble(0) === math.Pi)
  }

  test("registry remainder: aliases, literals, vector, hsin") {
    val df = spark.range(1, 10).select(
      (col("id").cast("double") / 7.0).as("x"),
      (col("id").cast("double") / 3.0 - 1.0).as("y"))
    val rows = df.select(col("x"), col("y"),
      V.fn("add", col("x"), col("y"), lit(1.0)).as("f_add"),
      V.fn("mul", col("x"), col("y"), lit(2.0)).as("f_mul"),
      V.fn("literal", lit("s")).as("f_lit"),
      V.fn("top", col("x")).as("f_top"),
      V.fn("if", V.fn("true"), lit(1), lit(0)).as("f_true"),
      V.fn("if", V.fn("false"), lit(1), lit(0)).as("f_false"),
      V.fn("vector", col("x"), col("y")).as("f_vec"),
      // hsin in radians == geodist in degrees at the earth radius
      V.fn("hsin", lit(6371.0087714), radians(lit(10.0)), radians(lit(20.0)),
        radians(col("x")), radians(col("y"))).as("f_hsin"),
      V.fn("geodist", lit(10.0), lit(20.0), col("x"), col("y")).as("f_geo"))
      .collect()
    rows.foreach { r =>
      val (x, y) = (r.getDouble(0), r.getDouble(1))
      assert(r.getDouble(2) === x + y + 1.0)
      assert(r.getDouble(3) === x * y * 2.0)
      assert(r.getString(4) === "s")
      assert(r.getDouble(5) === x)
      assert(r.getInt(6) === 1)
      assert(r.getInt(7) === 0)
      assert(r.getSeq[Double](8) === Seq(x, y))
      // hsin ≡ geodist up to op-order ulps (radians-of-difference vs
      // difference-of-radians)
      assert(math.abs(r.getDouble(9) - r.getDouble(10)) <=
        1e-12 * math.abs(r.getDouble(10)))
    }
  }

  test("dist p-norms: p=0 count, p=1 manhattan, p=2 euclid, p=inf chebyshev") {
    val df = spark.range(1).select(
      lit(1.0).as("x1"), lit(-2.0).as("x2"), lit(4.0).as("y1"), lit(-2.0).as("y2"))
    val xs = Seq(col("x1"), col("x2")); val ys = Seq(col("y1"), col("y2"))
    val r = df.select(
      V.dist(0, xs, ys), V.dist(1, xs, ys), V.dist(2, xs, ys),
      V.dist(3, xs, ys), V.dist(Double.PositiveInfinity, xs, ys)).head()
    assert(r.getDouble(0) === 1.0) // one differing dim
    assert(r.getDouble(1) === 3.0)
    assert(r.getDouble(2) === 3.0)
    assert(r.getDouble(3) === math.pow(27.0, 1.0 / 3))
    assert(r.getDouble(4) === 3.0)
  }

  test("ord/rord: dictionary ordinals, rord mirrors, never corpus-sized state") {
    val df = spark.createDataFrame(Seq(
      ("a", 1), ("c", 2), ("b", 3), ("c", 4), ("a", 5))).toDF("lang", "v")
    val out = V.rord(df, "lang").collect()
      .map(r => (r.getString(0), r.getInt(r.fieldIndex("lang_ord")),
        r.getInt(r.fieldIndex("lang_rord")))).toSet
    assert(out === Set(("a", 1, 3), ("b", 2, 2), ("c", 3, 1),
      ("a", 1, 3), ("c", 3, 1)))
  }

  test("IndexFunctions: df/ttf/idf/numdocs equal the index's own stats") {
    val ifn = new IndexFunctions(idx)
    val expected = idx.termStats.filter(col("term") === "spark")
      .select("df", "ttf").head()
    val r = spark.range(1).select(
      ifn.docfreq("spark"), ifn.totaltermfreq("spark"), ifn.idf("spark"),
      ifn.numdocs, ifn.sumtotaltermfreq,
      ifn.docfreq("zzz_not_a_term"), ifn.idf("zzz_not_a_term")).head()
    assert(r.getLong(0) === expected.getLong(0))
    assert(r.getLong(1) === expected.getLong(1))
    val n = idx.stats.docCount.toDouble; val df0 = expected.getLong(0).toDouble
    assert(r.getDouble(2) === math.log(1.0 + (n - df0 + 0.5) / (df0 + 0.5)))
    assert(r.getLong(3) === idx.stats.docCount)
    assert(r.getLong(4) === idx.stats.sumTotalTermFreq)
    // absent term: df 0, idf = ln(1 + (n+0.5)/0.5) — defined, no NaN
    assert(r.getLong(5) === 0L)
    assert(r.getDouble(6) === math.log(1.0 + (n + 0.5) / 0.5))
  }

  test("query($q) column: left join keeps the anchor hit set, default 0") {
    val anchor = rel.scoredTf(Seq("spark")).select("docId", "doc_id", "score")
    val withQ = rel.withQueryScore(anchor, Seq("zzz_not_a_term"), "qs")
    assert(withQ.count() === anchor.count())
    assert(withQ.filter(col("qs") =!= 0.0).count() === 0)
    // boostFnTopK ranks over exactly the anchor's hit set
    val hits = rel.boostFnTopK("spark", "merge", 1000).count()
    assert(hits === anchor.select("docId").distinct().count())
  }

  test("suggestFuzzy == brute-force gram expansion; weighted rank holds") {
    val dir = s"/tmp/gsuggest-test-${getClass.getSimpleName}"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    Suggest.buildNgramIndex(idx, dir)
    val got = Suggest.suggestFuzzy(spark, dir, "spar", 1, 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // brute force over the dictionary: any edge gram of len |p|±1
    // within 1 edit
    val dict = idx.termStats.select("term", "df").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = dict.filter { case (t, _) =>
      (3 to math.min(5, t.length)).exists(g => lev(t.substring(0, g), "spar") <= 1)
    }.sortBy { case (t, w) => (-w, t) }.take(10)
    assert(got === expect)
    // exact-prefix lookup stays available on the same table
    val pref = Suggest.suggestWeighted(spark, dir, "spark", 5).collect()
    assert(pref.nonEmpty)
    pref.foreach(r => assert(r.getString(0).startsWith("spark")))
  }
}
