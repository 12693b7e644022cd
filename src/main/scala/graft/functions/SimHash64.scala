package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a string's distinct whitespace tokens as a native
  * codegen'd Catalyst expression.
  *
  * The pure-Column formulation (aggregate over 64 bit positions × aggregate
  * over token hashes) runs in interpreted higher-order functions — measured
  * ~20 s on the sf0.1 corpus vs well under a second for this expression: one
  * tight Java loop per row, one token-set pass, 64 int votes on the stack.
  *
  * Token hash = Spark's xxhash64 (seed 42) over the token's UTF-8 bytes, so
  * values match what `xxhash64(token)` would produce in a plan. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.simhash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHashUtil {
  /** Same value as Spark's `xxhash64(lit(s))` (XXH64, seed 42, UTF-8 bytes). */
  def tokenHash(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
  }

  def simhash(s: String): Long = {
    val votes = new Array[Int](64)
    val seen = new java.util.HashSet[String]()
    val len = s.length
    var i = 0
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) {
        val tok = s.substring(start, i)
        if (seen.add(tok)) {
          val h = tokenHash(tok)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def simhash64(c: Column): Column = Bridge.column(SimHash64(Bridge.expression(c)))
}
