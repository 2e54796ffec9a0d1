package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URP chain: per-processor semantics + composition order. */
class UrpSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, "src1", null.asInstanceOf[String], "  the quick brown fox and the dog  "),
      (2L, "src2", "de", "der ich und die schule"),
      (3L, "src1", "en", "  the quick brown fox and the dog  "), // dup text of 1
      (4L, "src9", null.asInstanceOf[String], "")
    ).toDF("doc_id", "source", "lang", "text")
  }

  test("processors: default, clone+regex, trim, truncate") {
    val out = Urp.chain(
      Urp.defaultValue("lang", "und"),
      Urp.cloneField("source", "s2"),
      Urp.regexReplace("s2", "^src", "S"),
      Urp.trimFields("text"),
      Urp.truncate("text", 9))(df)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("lang")).toSeq === Seq("und", "de", "en", "und"))
    assert(out.map(_.getAs[String]("s2")).toSeq === Seq("S1", "S2", "S1", "S9"))
    assert(out.head.getAs[String]("text") === "the quick")
  }

  test("composition order matters and is left-to-right") {
    // truncate(5) THEN trim ≠ trim THEN truncate(5) on padded text
    val a = Urp.chain(Urp.truncate("text", 5), Urp.trimFields("text"))(df)
      .filter(col("doc_id") === 1).head().getAs[String]("text")
    val b = Urp.chain(Urp.trimFields("text"), Urp.truncate("text", 5))(df)
      .filter(col("doc_id") === 1).head().getAs[String]("text")
    assert(a === "the") // pad eats 2 of the 5 kept chars, then trimmed
    assert(b === "the q")
  }

  test("signatureDedup keeps the minimum key per identical signature") {
    val out = Urp.signatureDedup(Seq("text"), "doc_id")(df)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out === Seq(1L, 2L, 4L)) // doc 3 collapses into doc 1
  }

  test("signatureDedup: tied keys and all-null keys still keep exactly one row") {
    import spark.implicits._
    val dups = Seq[(java.lang.Long, String)](
      (1L, "same"), (1L, "same"),  // fully identical rows
      (null, "nullkey"),           // all-null-key group
      (null, "nullkey"),
      (7L, "other"))
      .toDF("doc_id", "text")
    val out = Urp.signatureDedup(Seq("text"), "doc_id")(dups)
      .select("text").collect().map(_.getString(0)).sorted.toSeq
    assert(out === Seq("nullkey", "other", "same"))
    // a pre-existing __sig0 column passes through untouched
    val shadow = dups.withColumn("__sig0", lit("mine"))
    val kept = Urp.signatureDedup(Seq("text"), "doc_id")(shadow)
    assert(kept.columns.contains("__sig0"))
    assert(kept.select("__sig0").distinct().collect().map(_.getString(0)).toSeq === Seq("mine"))
  }

  test("langDetect stamps the heuristic language id") {
    val out = Urp.langDetect("text", "lang_pred")(df)
      .orderBy("doc_id").collect().map(_.getAs[String]("lang_pred")).toSeq
    assert(out === Seq("en", "de", "en", "und"))
  }
}
