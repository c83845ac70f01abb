package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Float32-decimal oracle lint (r10 verdict item 3 / builder ROADMAP
  * item 4) — the generalized q102 lesson: a raw float32 value widened
  * to double can sit EXACTLY on a DECIMAL rounding midpoint (dyadic
  * fractions are common in real data), and the two engines then split
  * — Spark casts HALF_UP, DuckDB half-even — so an oracle that
  * DECIMAL-casts a raw embedding component is a latent cross-engine
  * mismatch even when every tested SF happens to dodge the midpoints.
  * The repo discipline is floor-quantization (`floor(x * 10^k)` longs)
  * on BOTH engines; this lint fails any oracle that reaches a DECIMAL
  * cast from a raw component without it.
  *
  * Scope (documented, deliberately syntactic): an operand is a "raw
  * component" when it accesses embedding elements directly
  * (`unnest(embedding…`, `embedding[`) or through an alias bound to
  * an un-floored `unnest(embedding)` / `list_transform(embedding…)`.
  * Whole-array consumers (`list_dot_product(embedding…)`) produce
  * full-precision doubles, not raw float32 values, and stay out of
  * scope — midpoint hits there are measure-zero, and the existing
  * DECIMAL(18,9) sum discipline covers them.
  */
class OracleLintSpec extends AnyFunSuite {

  /** Operand text of every DECIMAL cast in `sql` — both the
    * `CAST(expr AS DECIMAL…)` and `expr::DECIMAL…` forms. */
  private[queries] def decimalOperands(sql: String): Seq[String] = {
    val ops = scala.collection.mutable.ArrayBuffer.empty[String]
    // CAST( <operand> AS DECIMAL… ) — walk back over balanced parens
    val castRe = "(?i)\\sAS\\s+DECIMAL".r
    for (m <- castRe.findAllMatchIn(sql)) {
      var i = m.start - 1; var depth = 0; var open = -1
      while (i >= 0 && open < 0) {
        sql.charAt(i) match {
          case ')' => depth += 1
          case '(' => if (depth == 0) open = i else depth -= 1
          case _ =>
        }
        i -= 1
      }
      if (open >= 0) ops += sql.substring(open + 1, m.start).trim
    }
    // <operand>::DECIMAL… — operand is the preceding call or identifier
    val pgRe = "::\\s*DECIMAL".r
    for (m <- pgRe.findAllMatchIn(sql)) {
      var i = m.start - 1
      while (i >= 0 && sql.charAt(i).isWhitespace) i -= 1
      if (i >= 0 && sql.charAt(i) == ')') {
        var depth = 0; var open = -1; var j = i
        while (j >= 0 && open < 0) {
          sql.charAt(j) match {
            case ')' => depth += 1
            case '(' => { depth -= 1; if (depth == 0) open = j }
            case _ =>
          }
          j -= 1
        }
        var k = open - 1
        while (k >= 0 && (sql.charAt(k).isLetterOrDigit ||
          sql.charAt(k) == '_' || sql.charAt(k) == '.')) k -= 1
        if (open >= 0) ops += sql.substring(k + 1, i + 1).trim
      } else {
        var k = i
        while (k >= 0 && (sql.charAt(k).isLetterOrDigit ||
          sql.charAt(k) == '_' || sql.charAt(k) == '.' ||
          sql.charAt(k) == ']' || sql.charAt(k) == '[')) k -= 1
        if (k < i) ops += sql.substring(k + 1, i + 1).trim
      }
    }
    ops.toSeq
  }

  /** Aliases bound to un-floored raw-component expressions:
    * `unnest(embedding)… AS x` (x is a raw scalar) and
    * `list_transform(embedding…) AS v` (v[i] is a raw scalar). */
  private[queries] def rawAliases(sql: String): (Set[String], Set[String]) = {
    val scalar = "(?i)unnest\\s*\\(\\s*embedding\\s*\\)\\s*(?:::\\w+)?\\s+AS\\s+([A-Za-z_]\\w*)".r
      .findAllMatchIn(sql).map(_.group(1)).toSet
    val arr = "(?i)list_transform\\s*\\(\\s*embedding\\b([^)]*)\\)[^)]*?\\s+AS\\s+([A-Za-z_]\\w*)".r
      .findAllMatchIn(sql)
      .filterNot(m => m.group(1).toLowerCase.contains("floor"))
      .map(_.group(2)).toSet
    (scalar, arr)
  }

  /** True when the operand reaches a raw float32 component without
    * floor-quantization. */
  private[queries] def violates(sql: String, operand: String): Boolean = {
    if (operand.toLowerCase.contains("floor(")) return false
    val (scalars, arrays) = rawAliases(sql)
    val direct = "(?i)unnest\\s*\\(\\s*embedding".r.findFirstIn(operand).nonEmpty ||
      "(?i)\\bembedding\\s*\\[".r.findFirstIn(operand).nonEmpty
    val viaScalar = scalars.exists(a =>
      ("(?i)\\b" + java.util.regex.Pattern.quote(a) + "\\b").r
        .findFirstIn(operand).nonEmpty)
    val viaArray = arrays.exists(a =>
      ("(?i)\\b" + java.util.regex.Pattern.quote(a) + "\\s*\\[").r
        .findFirstIn(operand).nonEmpty)
    direct || viaScalar || viaArray
  }

  test("no oracle DECIMAL-casts a raw float32 embedding component " +
    "without floor-quantization") {
    val bad = for {
      (name, sql) <- graft.SparkEntry.oracleSql.toSeq
      op <- decimalOperands(sql)
      if violates(sql, op)
    } yield s"$name: DECIMAL cast over raw component: ${op.take(120)}"
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("the lint catches a seeded q102-class violation") {
    val seededDirect =
      "SELECT CAST(unnest(embedding)::DOUBLE AS DECIMAL(18,3)) FROM embeddings"
    assert(decimalOperands(seededDirect).exists(violates(seededDirect, _)),
      "direct raw-component DECIMAL cast must be flagged")
    val seededAlias =
      """WITH e AS (SELECT unnest(embedding)::DOUBLE AS x FROM embeddings)
        |SELECT x::DECIMAL(18,3) FROM e""".stripMargin
    assert(decimalOperands(seededAlias).exists(violates(seededAlias, _)),
      "aliased raw-component DECIMAL cast must be flagged")
    val seededArray =
      """WITH e AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS v
        | FROM embeddings)
        |SELECT CAST(v[1] AS DECIMAL(18,3)) FROM e""".stripMargin
    assert(decimalOperands(seededArray).exists(violates(seededArray, _)),
      "array-aliased raw-component DECIMAL cast must be flagged")
    // and the repaired (floor-quantized) forms pass
    val fixed =
      "SELECT CAST(floor(unnest(embedding)::DOUBLE * 1000) AS DECIMAL(18,0)) FROM embeddings"
    assert(!decimalOperands(fixed).exists(violates(fixed, _)),
      "floor-quantized cast must pass")
  }
}
