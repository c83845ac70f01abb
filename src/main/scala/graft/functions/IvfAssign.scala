package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `graft_ivf_cell(v, spec)` / `graft_ivf_probes(v, spec, n)` — the
  * coarse-IVF assignment argmin and probe list as ONE expression node
  * each, with the 32×64-double book riding the plan as a
  * doubleToLongBits-hex spec literal ([[PqDecode]]'s rationale): the
  * composed literal form folded the whole book into 32 per-cell score
  * expressions, and Catalyst planning + codegen over that tree cost
  * ~0.5–0.9 s of DRIVER time per execution (q129's stage-listener
  * decomposition: 1.9 s wall, 0.9 s stages — the q164 pathology on the
  * assignment side).
  *
  * Arithmetic is bit-identical to the literal form it replaces:
  * score_k = ‖c_k‖² − 2·(v·c_k) with ‖c_k‖² precomputed by the same
  * strict ascending fold at spec-parse time (the exact doubles, hex
  * round-trip), the dot the same ascending loop as [[DotProduct]], and
  * ties resolved to the smallest cell id. (A −0.0/+0.0 score tie could
  * in principle order differently than the old array_position equality
  * — a measure-zero event for sums of products; the DuckDB oracle
  * re-checks every serve query end-to-end.)
  */
object IvfAssignTable {

  final class Book(val cents: Array[Array[Double]]) extends Serializable {
    val c2s: Array[Double] = cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }

    private def score(k: Int, v: ArrayData): Double = {
      val c = cents(k)
      var acc = 0.0
      var i = 0
      while (i < c.length) { acc += v.getDouble(i) * c(i); i += 1 }
      c2s(k) - 2.0 * acc
    }

    // typed-error-over-silent-garbage (Int8Decode's convention): a
    // vector shorter/longer than the book's dim would otherwise
    // compute a truncated dot and return a plausible-but-wrong cell
    private def checkDim(v: ArrayData): Unit =
      if (v.numElements() != cents(0).length)
        throw new IllegalArgumentException(
          s"graft_ivf: vector of ${v.numElements()} elements against a " +
            s"dim-${cents(0).length} codebook")

    def cell(v: ArrayData): Long = {
      checkDim(v)
      var best = 0
      var bs = score(0, v)
      var k = 1
      while (k < cents.length) {
        val s = score(k, v)
        if (java.lang.Double.compare(s, bs) < 0) { bs = s; best = k }
        k += 1
      }
      best.toLong
    }

    def probes(v: ArrayData, n: Int): ArrayData = {
      checkDim(v)
      val sc = Array.tabulate(cents.length)(k => score(k, v))
      val idx = Array.tabulate(cents.length)(_.toLong)
      // full sort of ≤ cells elements by (score, cid) — the array_sort
      // ordering of the struct form this replaces
      val order = idx.sortWith { (a, b) =>
        val c = java.lang.Double.compare(sc(a.toInt), sc(b.toInt))
        c < 0 || (c == 0 && a < b)
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(order.take(math.min(n, order.length)))
    }
  }

  private def hex(xs: Iterator[Double]): String =
    xs.map(d => java.lang.Long.toHexString(
      java.lang.Double.doubleToLongBits(d))).mkString(",")

  def toSpec(cents: Array[Array[Double]]): String =
    s"${cents.length} ${cents(0).length};" + hex(cents.iterator.flatten)

  def parseSpec(spec: String): Book = {
    val Array(head, bits) = spec.split(";", 2)
    val Array(cells, dim) = head.split(" ").map(_.toInt)
    val flat = bits.split(",").map(x =>
      java.lang.Double.longBitsToDouble(
        java.lang.Long.parseUnsignedLong(x, 16)))
    if (flat.length != cells * dim) throw new IllegalArgumentException(
      s"graft_ivf spec: ${flat.length} values for $cells x $dim geometry")
    new Book(Array.tabulate(cells, dim)((k, d) => flat(k * dim + d)))
  }
}

case class IvfCell(child: Expression, spec: String) extends UnaryExpression {

  @transient private lazy val book: IvfAssignTable.Book =
    IvfAssignTable.parseSpec(spec)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ivf_cell expects array<double>, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ivf_cell"

  override protected def nullSafeEval(v: Any): Any =
    book.cell(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfBook", book,
      classOf[IvfAssignTable.Book].getName)
    defineCodeGen(ctx, ev, c => s"$ref.cell($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCell =
    copy(child = newChild)
}

case class IvfProbes(child: Expression, spec: String, n: Int)
  extends UnaryExpression {

  @transient private lazy val book: IvfAssignTable.Book =
    IvfAssignTable.parseSpec(spec)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ivf_probes expects array<double>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ivf_probes"

  override protected def nullSafeEval(v: Any): Any =
    book.probes(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfBook", book,
      classOf[IvfAssignTable.Book].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probes($c, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfProbes =
    copy(child = newChild)
}
