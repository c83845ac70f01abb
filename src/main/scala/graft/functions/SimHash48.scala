package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_simhash(text) → BIGINT` — the 48-bit frequency-weighted
  * SimHash fingerprint (graft.llm.Dedup's definition: bit b reads hex
  * digit b/4 of md5(token), weight-bit 8 >> b%4, signed by token
  * frequency) as ONE row-local expression. The composed plan exploded
  * every token, shuffled a (doc, token) count aggregation, projected
  * 12 hex-digit columns, and folded 48 signed sums in a second
  * aggregation — two corpus-scale exchanges to compute a per-document
  * value. This computes the same integer sums in a tight per-row loop
  * (distinct-token counts in a local map, one md5 per distinct token,
  * nibble tests on the digest bytes), leaving q28 scan-shaped and
  * q29's fingerprint pass exchange-free.
  *
  * Exactness: the per-bit sums are order-independent integer
  * arithmetic over the same ±cnt contributions, and the nibble test
  * `(nib >> (3 - b%4)) & 1` reads the identical bit the hex-digit
  * `isin` classes test — results are bit-equal to the aggregation
  * form (SimHash48Spec proves it on real documents). NULL for texts
  * with zero tokens, matching the aggregation form's absent row
  * (callers filter).
  */
object SimHash48 {

  def simhash(u: UTF8String): java.lang.Long = {
    val str = u.toString
    // Spark's trim() strips 0x20 only — match it, not String.trim
    var s = 0
    var e = str.length
    while (s < e && str.charAt(s) == ' ') s += 1
    while (e > s && str.charAt(e - 1) == ' ') e -= 1
    // java regex \s is ASCII-only ([ \t\n\x0B\f\r]) — split on exactly
    // that class, NOT Character.isWhitespace (which admits U+2028 etc.)
    @inline def ws(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
    val counts = new java.util.HashMap[String, Integer]()
    var i = s
    while (i < e) {
      var j = i
      while (j < e && !ws(str.charAt(j))) j += 1
      if (j > i) counts.merge(str.substring(i, j), 1, (a, b) => a + b)
      i = j
      while (i < e && ws(str.charAt(i))) i += 1
    }
    if (counts.isEmpty) return null
    val sums = new Array[Long](48)
    val md = java.security.MessageDigest.getInstance("MD5")
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val ent = it.next()
      val c = ent.getValue.longValue()
      md.reset()
      val d = md.digest(ent.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var b = 0
      while (b < 48) {
        val hexIdx = b / 4
        val by = d(hexIdx / 2) & 0xFF
        val nib = if (hexIdx % 2 == 0) by >> 4 else by & 0xF
        sums(b) += (if (((nib >> (3 - (b % 4))) & 1) == 1) c else -c)
        b += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 48) { if (sums(b) > 0) fp |= (1L << b); b += 1 }
    java.lang.Long.valueOf(fp)
  }
}

case class SimHash48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects STRING, got $t")
  }

  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(t: Any): Any =
    SimHash48.simhash(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nv = ctx.freshName("sh")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $nv = graft.functions.SimHash48.simhash($c);
      if ($nv == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $nv.longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}
