package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_min_gram_md5(text, n)` — q36's rolling document fingerprint
  * (min md5 over all `n`-char grams, the single-window winnowing form)
  * as ONE row-local expression. The composed plan exploded one row per
  * character position and min-combined them back (len(text) Catalyst
  * rows per document just to fold a minimum); this computes the same
  * min in a tight loop over the UTF-8 bytes: char boundaries are
  * walked once, each gram is digested in place (no substring
  * allocation), and the 16-byte digests compare unsigned — the byte
  * order IS the hex-string order the oracle's `min(md5(substr(...)))`
  * folds, so results are identical.
  *
  * Returns NULL for texts shorter than `n` chars (the query filters
  * them; NULL keeps the expression total). Reference semantics:
  * gopali24/ML_with_Spark_Streaming has no fingerprinting — this is
  * engine surface beyond the reference, per SURVEY §2's LLM-pipeline
  * extension.
  */
object MinGramMd5 {

  private val hexChars = "0123456789abcdef".toCharArray

  def minGram(u: UTF8String, n: Int): UTF8String = {
    val bytes = u.getBytes
    // char-boundary byte offsets (UTF-8 lead bytes), one pass
    val nChars = u.numChars()
    if (nChars < n) return null
    val offs = new Array[Int](nChars + 1)
    var b = 0
    var c = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xC0) != 0x80) { offs(c) = b; c += 1 }
      b += 1
    }
    offs(c) = bytes.length
    val md = java.security.MessageDigest.getInstance("MD5")
    var best: Array[Byte] = null
    var i = 0
    val last = nChars - n
    while (i <= last) {
      md.reset()
      md.update(bytes, offs(i), offs(i + n) - offs(i))
      val d = md.digest()
      if (best == null || unsignedLt(d, best)) best = d
      i += 1
    }
    val out = new Array[Char](32)
    var j = 0
    while (j < 16) {
      out(j * 2) = hexChars((best(j) >> 4) & 0xF)
      out(j * 2 + 1) = hexChars(best(j) & 0xF)
      j += 1
    }
    UTF8String.fromString(new String(out))
  }

  private def unsignedLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val c = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (c != 0) return c < 0
      i += 1
    }
    false
  }
}

case class MinGramMd5(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"graft_min_gram_md5 gram size must be > 0, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_min_gram_md5 expects STRING, got $t")
  }

  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_min_gram_md5"

  override protected def nullSafeEval(t: Any): Any =
    MinGramMd5.minGram(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nv = ctx.freshName("mg")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.unsafe.types.UTF8String $nv =
        graft.functions.MinGramMd5.minGram($c, $n);
      if ($nv == null) { ${ev.isNull} = true; } else { ${ev.value} = $nv; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinGramMd5 =
    copy(child = newChild)
}
