package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `graft_dot(a, b)` — dot product of two `array<double>` columns as a
  * native Catalyst expression.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0d, _+_)` or an unrolled
  * `Σ a[i]*b[i]` tree? Both are semantically identical but evaluate one
  * expression node per element (higher-order functions additionally fall
  * back to interpreted mode). On brute-force pair scans (millions of rows
  * × 64 elements) that overhead dominates: measured at sf0.1, the
  * interpreted fold costs ~65 s and the unrolled tree ~30 s for q30,
  * vs ~1 s for this expression's tight loop over `ArrayData.getDouble`
  * (direct memory reads on UnsafeArrayData, no per-element expression
  * dispatch, no boxing).
  *
  * Determinism: strict left-to-right accumulation starting at 0.0 —
  * bit-identical to DuckDB's `list_dot_product` on `DOUBLE[]`, which is
  * what keeps the cosine queries exact-oracle-able.
  *
  * Null elements inside the arrays are not expected (inputs are cast
  * embeddings); a null array yields null via BinaryExpression's
  * null-intolerant default. Lengths may differ — the shorter bounds the
  * loop (matches zip_with-then-sum-over-min semantics).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  private def okInput(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case org.apache.spark.sql.types.NullType => true // NULL literal → null out
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okInput(left.dataType) && okInput(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), " +
        s"got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
