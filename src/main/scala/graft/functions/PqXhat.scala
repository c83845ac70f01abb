package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `graft_pq_xhat(v, spec)` — PQ encode-and-reconstruct as ONE
  * expression node with the fine books riding the plan as a
  * doubleToLongBits-hex spec literal. The composed-Column form
  * ([[graft.llm.Pq.reconstructWith]]'s old body) folded the M×K×SubDim
  * book into per-subspace argmin trees — ~0.5 s of driver
  * planning/codegen per execution of q64's raw-PQ arm (the q164/q129
  * pathology). Arithmetic is bit-identical: per subspace the score is
  * ‖c‖² − 2·(v_m·c) with ‖c‖² precomputed by the same strict fold at
  * spec-parse time, the dot the same ascending loop as [[DotProduct]]
  * over the sliced index range, ties to the smallest codeword id, and
  * x̂ is the chosen centroids concatenated in subspace order.
  */
object PqXhatTable {

  final class Books(val bks: Array[Array[Array[Double]]])
    extends Serializable {
    private val nSub = bks.length
    private val nCent = bks(0).length
    private val subDim = bks(0)(0).length
    private val c2s: Array[Array[Double]] = bks.map(_.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    })

    def xhat(v: ArrayData): ArrayData = {
      // typed-error-over-silent-garbage (Int8Decode's convention): a
      // short vector would read past its end, a long one silently
      // drop trailing dims — both are geometry bugs, fail loudly
      if (v.numElements() != nSub * subDim)
        throw new IllegalArgumentException(
          s"graft_pq_xhat: vector of ${v.numElements()} elements against " +
            s"$nSub x $subDim codebook geometry")
      val out = new Array[Double](nSub * subDim)
      var m = 0
      while (m < nSub) {
        val off = m * subDim
        var best = 0
        var bs = Double.NaN
        var k = 0
        while (k < nCent) {
          val c = bks(m)(k)
          var acc = 0.0
          var i = 0
          while (i < subDim) { acc += v.getDouble(off + i) * c(i); i += 1 }
          val sc = c2s(m)(k) - 2.0 * acc
          if (k == 0 || java.lang.Double.compare(sc, bs) < 0) {
            bs = sc; best = k
          }
          k += 1
        }
        System.arraycopy(bks(m)(best), 0, out, off, subDim)
        m += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }
  }

  private def hex(xs: Iterator[Double]): String =
    xs.map(d => java.lang.Long.toHexString(
      java.lang.Double.doubleToLongBits(d))).mkString(",")

  def toSpec(bks: Array[Array[Array[Double]]]): String =
    s"${bks.length} ${bks(0).length} ${bks(0)(0).length};" +
      hex(bks.iterator.flatMap(_.iterator).flatten)

  def parseSpec(spec: String): Books = {
    val Array(head, bits) = spec.split(";", 2)
    val Array(m, k, sub) = head.split(" ").map(_.toInt)
    val flat = bits.split(",").map(x =>
      java.lang.Double.longBitsToDouble(
        java.lang.Long.parseUnsignedLong(x, 16)))
    if (flat.length != m * k * sub) throw new IllegalArgumentException(
      s"graft_pq_xhat spec: ${flat.length} values for $m x $k x $sub geometry")
    new Books(Array.tabulate(m, k, sub)((mm, kk, d) =>
      flat((mm * k + kk) * sub + d)))
  }
}

case class PqXhat(child: Expression, spec: String) extends UnaryExpression {

  @transient private lazy val books: PqXhatTable.Books =
    PqXhatTable.parseSpec(spec)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_xhat expects array<double>, got $t")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_xhat"

  override protected def nullSafeEval(v: Any): Any =
    books.xhat(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books,
      classOf[PqXhatTable.Books].getName)
    defineCodeGen(ctx, ev, c => s"$ref.xhat($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqXhat =
    copy(child = newChild)
}
