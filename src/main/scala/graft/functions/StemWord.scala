package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Porter2

/** `graft_stem(token)` — Porter2 (Snowball English) stem of a single
  * token as a Catalyst expression (registered by graft.GraftExtensions).
  *
  * Mirrors the reference's NLTK SnowballStemmer Python UDF
  * (`SGDC/sgdc.py:59-61`) but stays in the JVM: used inside
  * `transform(tokens, t -> graft_stem(t))` it keeps the featurization
  * pipeline free of Python workers. Implements `doGenCode` as a static
  * call rather than CodegenFallback — the stem itself is
  * string-dominated either way, but a fallback expression would kick
  * the WHOLE enclosing stage out of whole-stage codegen.
  */
case class StemWord(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_stem expects string, got $t")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_stem"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Porter2.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.text.Porter2.stem($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): StemWord =
    copy(child = newChild)
}
