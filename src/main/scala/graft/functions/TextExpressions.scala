package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin polynomial rolling hash of a string's UTF-8 bytes:
  * h = Σ b_i · B^(n−1−i) in wrapping 64-bit arithmetic, base B = 257.
  *
  * Used as the document fingerprint (content-addressable dedup key,
  * stable across partitioning and engines that share the definition).
  * A native expression with codegen: the hot loop runs over the
  * UnsafeRow's byte array with zero allocation.
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_fingerprint64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 257L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint64.hash($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Fingerprint64 {
  /** Called from generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 257L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(Fingerprint64(GraftColumnBridge.expression(c)))
}
