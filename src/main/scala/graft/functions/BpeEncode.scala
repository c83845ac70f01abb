package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.Bpe

/** `graft_bpe(token)` — the frozen-merge-table BPE encoding of a single
  * token, pieces space-joined (registered by graft.GraftExtensions).
  *
  * Same native-expression rationale as [[StemWord]]: the apply loop is
  * iterative string surgery no SQL composition expresses, but as a
  * static-call `doGenCode` it stays inside whole-stage codegen instead
  * of kicking the enclosing stage out (a CodegenFallback would) or
  * paying a Python worker round-trip (the historical UDF shape).
  */
case class BpeEncode(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe expects string, got $t")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_bpe"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Bpe.encodeJoined(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.llm.Bpe.encodeJoined($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
