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

/** `graft_bpe_tbl(token, spec)` — BPE encoding with an EXPLICIT merge
  * table carried in the plan (spec = a STRING literal of "lhs rhs"
  * lines, Bpe.toSpec's wire format). This is the serve half of the
  * BPE train→apply loop: q99 builds the spec from the
  * ArtifactStore-published table BpeTrain produced, and because the
  * table rides the expression (addReferenceObj — serialized with the
  * plan, parsed once), the SAME plan is correct on a 1000-executor
  * cluster, not just one JVM. BloomProbe's literal-argument pattern.
  */
case class BpeEncodeTbl(child: Expression, spec: String)
  extends UnaryExpression {

  @transient private lazy val table: Bpe.Table = Bpe.parseSpec(spec)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_tbl expects string, got $t")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_bpe_tbl"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Bpe.encodeJoinedWith(input.asInstanceOf[UTF8String].toString, table))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[Bpe.Table].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.llm.Bpe.encodeJoinedWith($c.toString(), $ref))")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeTbl =
    copy(child = newChild)
}
