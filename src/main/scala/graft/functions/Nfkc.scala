package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFKC normalization as a native Catalyst expression with codegen.
  *
  * Reference semantics: `unicodedata.normalize("NFKC", text)` — the first step of
  * every normalization pipeline in the reference
  * (src/address_matching/normalization/normalize_address.py:134,284).
  *
  * Implemented as a codegen'd `UnaryExpression` (not a Scala UDF) so the whole
  * normalizer chain stays inside WholeStageCodegen: the generated Java calls
  * `java.text.Normalizer.normalize` directly, with the common fast path
  * (`Normalizer.isNormalized`) avoiding any allocation for already-normalized
  * input — which at web scale is the overwhelming majority of rows.
  */
case class Nfkc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfkc"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(NfkcUtil.normalize(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.NfkcUtil.normalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Nfkc = copy(child = newChild)
}

/** Static entry point shared by interpreted eval and generated code; a plain
  * object (no overloads) so janino resolves the static forwarder cleanly. */
object NfkcUtil {
  def normalize(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFKC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
}

object Nfkc {
  def nfkc(c: Column): Column = Bridge.column(Nfkc(Bridge.expression(c)))
}
