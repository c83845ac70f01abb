package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_stop_len(w)` → [stop_count, len_sum] — the two O(tokens)
  * reductions the quality heuristics need, as one native pass. The
  * composed form scanned a 180-element stop-word literal array PER
  * TOKEN inside an interpreted higher-order `filter` (tokens ×
  * stop-words string comparisons), and `aggregate` for the length sum
  * evaluated its lambda interpreted too — measured as the dominant
  * cost of q34 and every quality-gated verdict (q75/q87/q140/q157).
  * Here membership is one hash probe against the frozen
  * [[graft.text.Tokenize.stopWords]] set (UTF8String binary equality —
  * exactly `array_contains`' comparison) and the length is
  * `numChars` (code points — exactly `length()`), so both counts are
  * bit-identical to the expressions they replace.
  */
object StopLenTable {
  /** Frozen stop set as UTF8String bytes (array_contains' equality). */
  lazy val Stops: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    graft.text.Tokenize.stopWords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def stats(w: ArrayData): ArrayData = {
    val n = w.numElements()
    var stopCnt = 0L
    var lenSum = 0L
    var i = 0
    while (i < n) {
      val t = w.getUTF8String(i)
      if (t != null) {
        if (Stops.contains(t)) stopCnt += 1
        lenSum += t.numChars()
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(stopCnt, lenSum))
  }
}

case class StopLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_stop_len expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_stop_len"

  override protected def nullSafeEval(w: Any): Any =
    StopLenTable.stats(w.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"${StopLenTable.getClass.getName.stripSuffix("$")}$$.MODULE$$.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): StopLen =
    copy(child = newChild)
}
