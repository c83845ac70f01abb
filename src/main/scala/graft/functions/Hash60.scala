package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper for [[Hash60]]: the engine-wide 60-bit md5 prefix,
  * computed directly from digest bytes. Bit-identical to the SQL chain
  * `conv(substring(md5(x), 1, 15), 16, 10)` — the first 15 hex chars
  * of an md5 are the first 60 bits of the digest, i.e. the big-endian
  * long of bytes 0..7 shifted right by 4 — without ever rendering the
  * 32-char hex string or parsing 15 chars of it back into a long.
  */
object Hash60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** `graft_h60(str)` — the deterministic-randomness hash every sketch,
  * sample, and shingle in the engine rides (SURVEY §5.1), as a native
  * codegen'd expression. Same value as the portable SQL chain (which
  * remains the DuckDB-oracle form), ~2 string materializations cheaper
  * per call: Spark's `md5` renders a 32-char hex UTF8String and `conv`
  * parses 15 chars of it back; this goes digest-bytes → long.
  */
case class Hash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_h60 expects string, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_h60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60Expr =
    copy(child = newChild)
}
