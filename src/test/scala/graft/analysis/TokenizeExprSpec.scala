package graft.analysis

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native TokenizeExpr: eval == codegen == in-memory analyze; SQL
  * registration; plan stays codegen'd (no ScalaUDF node). */
class TokenizeExprSpec extends SparkSpec {

  private val samples = Seq(
    "The quick BROWN fox", "state-of-the-art B2B 3.14 can't",
    "Ünïcode 北京 naïve", "", "   ", "x" * 300,
    "spark join merge the a batch")

  test("expression output == Analysis.analyze (no stop/stem)") {
    import spark.implicits._
    val df = samples.toDF("text")
      .select(col("text"), TokenizeExpr.tokenizeLower(col("text")).as("t"))
    df.collect().foreach { r =>
      val expected = Analysis.analyze(r.getString(0)).toSeq
      assert(r.getSeq[String](1) === expected, s"for '${r.getString(0).take(30)}'")
    }
  }

  test("registered SQL function graft_tokenize") {
    import spark.implicits._
    TokenizeExpr.register(spark)
    samples.toDF("text").createOrReplaceTempView("tok_in")
    val out = spark.sql(
      "SELECT text, graft_tokenize(text) AS t FROM tok_in").collect()
    out.foreach { r =>
      assert(r.getSeq[String](1) === Analysis.analyze(r.getString(0)).toSeq)
    }
  }

  test("plan contains the native expression, not a ScalaUDF") {
    // a real source (local Seqs get constant-folded by the optimizer)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TokenizeExpr.tokenizeLower(col("text")).as("t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_tokenize"), plan)
    assert(!plan.contains("UDF"), plan)
  }
}
