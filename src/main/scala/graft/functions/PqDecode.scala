package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `graft_pq_decode(cell, codes, spec)` — IVFADC reconstruction
  * x̂ = coarse(cell) + Σ_m resBook(m)(codes_m) from the stored index
  * attributes, with BOTH codebooks riding the plan as one compact spec
  * literal (BpeEncodeTbl's pattern, `addReferenceObj` — serialized
  * with the plan, parsed once per executor, cluster-correct).
  *
  * Why a native expression and not composed element_at arithmetic: the
  * composed form embeds the 32×64-double coarse book as a FOLDED
  * LITERAL into each of the 64 output elements — the logical plan
  * carries ~64 copies of the book, and Catalyst optimization + codegen
  * of that megabyte-scale tree cost ~3.5 s of DRIVER time per q164
  * execution (measured: stage wall time 1.2 s, query wall 4.7 s). One
  * expression node makes the plan O(spec) bytes, keeps whole-stage
  * codegen, and decodes in a tight primitive loop.
  *
  * The spec wire format is doubleToLongBits hex (exact round-trip —
  * Double.toString would survive too, but bits are unambiguous):
  * `cells subDim m k;coarsebits;bookbits`, arrays flattened row-major.
  */
object PqDecodeTable {

  /** Parsed decoder: coarse(cells)(dim), books(m)(k)(subDim). */
  final class Dec(val coarse: Array[Array[Double]],
                  val books: Array[Array[Array[Double]]]) extends Serializable {
    private val dim = coarse(0).length
    private val sub = books(0)(0).length

    def decode(cell: Long, codes: ArrayData): ArrayData = {
      // typed errors over silent garbage: getLong is unchecked and a
      // bad cell would surface as an opaque executor AIOOBE
      if (cell < 0 || cell >= coarse.length) throw new IllegalArgumentException(
        s"graft_pq_decode: cell $cell outside [0, ${coarse.length})")
      if (codes.numElements() < books.length) throw new IllegalArgumentException(
        s"graft_pq_decode: ${codes.numElements()} codes for ${books.length} subspaces")
      var m = 0
      while (m < books.length) {
        val k = codes.getLong(m)
        if (k < 0 || k >= books(m).length) throw new IllegalArgumentException(
          s"graft_pq_decode: code $k outside [0, ${books(m).length})")
        m += 1
      }
      val c = coarse(cell.toInt)
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        out(i) = c(i) + books(i / sub)(codes.getLong(i / sub).toInt)(i % sub)
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }
  }

  private def hex(xs: Iterator[Double]): String =
    xs.map(d => java.lang.Long.toHexString(
      java.lang.Double.doubleToLongBits(d))).mkString(",")

  def toSpec(coarse: Array[Array[Double]],
             books: Array[Array[Array[Double]]]): String = {
    val head = s"${coarse.length} ${books(0)(0).length} " +
      s"${books.length} ${books(0).length}"
    head + ";" + hex(coarse.iterator.flatten) + ";" +
      hex(books.iterator.flatMap(_.iterator).flatten)
  }

  def parseSpec(spec: String): Dec = {
    val Array(head, cbits, bbits) = spec.split(";", 3)
    val Array(cells, sub, m, k) = head.split(" ").map(_.toInt)
    val dim = m * sub
    def longs(s: String) = s.split(",").iterator
      .map(x => java.lang.Double.longBitsToDouble(
        java.lang.Long.parseUnsignedLong(x, 16)))
    val cf = longs(cbits).toArray
    val bf = longs(bbits).toArray
    // the spec head declares the geometry; a coarse book wider than
    // m*sub would otherwise mis-slice every cell after the first
    if (cf.length != cells * dim) throw new IllegalArgumentException(
      s"graft_pq_decode spec: coarse book has ${cf.length} values, " +
        s"geometry declares $cells cells x $dim dims")
    if (bf.length != m * k * sub) throw new IllegalArgumentException(
      s"graft_pq_decode spec: fine books have ${bf.length} values, " +
        s"geometry declares $m x $k x $sub")
    val coarse = Array.tabulate(cells, dim)((i, d) => cf(i * dim + d))
    val books = Array.tabulate(m, k, sub)((mm, kk, d) =>
      bf((mm * k + kk) * sub + d))
    new Dec(coarse, books)
  }
}

case class PqDecode(left: Expression, right: Expression, spec: String)
  extends BinaryExpression {

  @transient private lazy val dec: PqDecodeTable.Dec =
    PqDecodeTable.parseSpec(spec)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_decode expects (bigint, array<bigint>), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_pq_decode"

  override protected def nullSafeEval(cell: Any, codes: Any): Any =
    dec.decode(cell.asInstanceOf[Long], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqDec", dec,
      classOf[PqDecodeTable.Dec].getName)
    defineCodeGen(ctx, ev, (c, cd) => s"$ref.decode($c, $cd)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqDecode =
    copy(left = newLeft, right = newRight)
}
