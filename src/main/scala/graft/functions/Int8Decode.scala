package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `graft_int8_decode(codes, spec)` — scalar-quantization dequant
  * x̂_i = mn_i + ((code_i + 0.5)·(mx_i − mn_i)) / 255 (bucket centers,
  * q106's exact expression shapes) from stored int8 codes, with the
  * per-dim scale table riding the plan as a doubleToLongBits-hex spec
  * literal. Same rationale as [[PqDecode]]: one expression node keeps
  * the plan small and whole-stage-codegen'd where composed per-element
  * arithmetic over 64 dims bloats the tree. A degenerate dim
  * (mx = mn) decodes to mn, matching the q106/q113 convention.
  */
object Int8DecodeTable {

  final class Dec(val mns: Array[Double], val mxs: Array[Double])
    extends Serializable {
    def decode(codes: ArrayData): ArrayData = {
      val n = mns.length
      // UnsafeArrayData.getLong does NO bounds check — a short codes
      // array would silently read adjacent buffer memory
      if (codes.numElements() < n) throw new IllegalArgumentException(
        s"graft_int8_decode: ${codes.numElements()} codes for $n dims")
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        val code = codes.getLong(i)
        // typed-error-over-silent-garbage, matching PqDecode's
        // per-code range check
        if (code < 0L || code > 255L) throw new IllegalArgumentException(
          s"graft_int8_decode: code $code at dim $i outside [0, 255]")
        val mn = mns(i); val mx = mxs(i)
        out(i) =
          if (mx == mn) mn
          else mn + ((code + 0.5) * (mx - mn)) / 255.0
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }
  }

  private def hex(xs: Iterator[Double]): String =
    xs.map(d => java.lang.Long.toHexString(
      java.lang.Double.doubleToLongBits(d))).mkString(",")

  def toSpec(mns: Array[Double], mxs: Array[Double]): String =
    hex(mns.iterator) + ";" + hex(mxs.iterator)

  def parseSpec(spec: String): Dec = {
    val Array(a, b) = spec.split(";", 2)
    def arr(s: String) = s.split(",").map(x =>
      java.lang.Double.longBitsToDouble(
        java.lang.Long.parseUnsignedLong(x, 16)))
    new Dec(arr(a), arr(b))
  }
}

case class Int8Decode(child: Expression, spec: String)
  extends UnaryExpression {

  @transient private lazy val dec: Int8DecodeTable.Dec =
    Int8DecodeTable.parseSpec(spec)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_int8_decode expects array<bigint>, got $t")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_int8_decode"

  override protected def nullSafeEval(codes: Any): Any =
    dec.decode(codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("int8Dec", dec,
      classOf[Int8DecodeTable.Dec].getName)
    defineCodeGen(ctx, ev, c => s"$ref.decode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Int8Decode =
    copy(child = newChild)
}
