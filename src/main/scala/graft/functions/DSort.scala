package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving IEEE-754 double ↔ BIGINT codec — the classic
  * sortable-bits trick (public knowledge; Lucene ships it as
  * `NumericUtils.doubleToSortableLong`): flip all the bits of a
  * negative double except the sign, leave positives alone, and the
  * signed-long order equals `java.lang.Double.compare`'s total order
  * (−0.0 < +0.0, NaN above +∞).
  *
  * Purpose here: [[TopK]]'s bounded heap scores BIGINTs, and the ANN
  * audit truth arms rank DOUBLE cosines/L2²s — the codec carries the
  * double through the heap without losing a bit (r9 verdict item 3).
  * `graft_dsort_inv` restores the exact original double from the heap
  * output, so q31's `cos` column round-trips bit-identically.
  */
object DSortCodec {
  def enc(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }
  def dec(s: Long): Double =
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & 0x7fffffffffffffffL))
}

/** `graft_dsort(d DOUBLE) → BIGINT` — order-isomorphic encode. */
case class DSort(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_dsort expects DOUBLE, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dsort"
  override protected def nullSafeEval(d: Any): Any =
    DSortCodec.enc(d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DSortCodec.enc($c)")
  override protected def withNewChildInternal(newChild: Expression): DSort =
    copy(child = newChild)
}

/** `graft_dsort_inv(s BIGINT) → DOUBLE` — exact inverse of
  * [[DSort]]: `dec(enc(d))` returns the original bits. */
case class DSortInv(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_dsort_inv expects BIGINT, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dsort_inv"
  override protected def nullSafeEval(s: Any): Any =
    DSortCodec.dec(s.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DSortCodec.dec($c)")
  override protected def withNewChildInternal(newChild: Expression): DSortInv =
    copy(child = newChild)
}
