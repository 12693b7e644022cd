package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen'd Catalyst expression
  * (standard 0.1 prefix scale, max prefix 4, boost threshold 0.7 — the
  * Apache Commons Text / DuckDB convention, same kernel as the scoring
  * mapPartitions path, [[graft.operators.Scoring.jaroWinkler]]).
  *
  * Replaces the last `udf(...)` wrapper in an oracled catalog query: a
  * ScalaUDF forces GenericInternalRow boxing and blocks whole-stage codegen
  * fusion around the call site; this expression is one static Java call
  * inside the generated loop (the [[SimHash64]] pattern). */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    graft.operators.Scoring.jaroWinkler(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.operators.Scoring.jaroWinkler($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerExpr(Bridge.expression(a), Bridge.expression(b)))
}
