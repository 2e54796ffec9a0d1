package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftBridge

/** Native Catalyst expression for UAX#29 tokenization + lowercasing —
  * the promoted form of the analyzer's hot scalar function (SURVEY.md
  * §7.3: "promote hot ones to Catalyst Expression with codegen"):
  * unlike a ScalaUDF there is no encoder round-trip per row, and
  * `doGenCode` emits a direct static call so the projection stays
  * inside whole-stage codegen. */
case class TokenizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    TokenizeExpr.tokenizeToArrayData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.analysis.TokenizeExpr.tokenizeToArrayData($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenizeExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_tokenize"
}

object TokenizeExpr {

  /** Static kernel shared by eval and generated code. */
  def tokenizeToArrayData(text: UTF8String): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val s = text.toString
    val out = new java.util.ArrayList[AnyRef]()
    Analysis.scanTokens(s, Analysis.MaxTokenLength) { (st, en) =>
      out.add(UTF8String.fromString(
        Analysis.lowercase(s.substring(st, en))))
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API: tokenize + lowercase in one codegen'd expression. */
  def tokenizeLower(c: Column): Column =
    GraftBridge.toColumn(TokenizeExpr(GraftBridge.toExpr(c)))

  /** Register as a SQL function `graft_tokenize(text)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftBridge.registerFunction(spark, "graft_tokenize",
      exprs => TokenizeExpr(exprs.head))
}
