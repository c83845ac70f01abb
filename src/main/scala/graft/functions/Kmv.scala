package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values, Bar-Yossef et al. 2002) buffer: the k
  * smallest DISTINCT hash values seen. Kept as a sorted set capped at
  * k: update is O(log k) with an early reject against the current
  * maximum, merge is the k-bounded set union — KMV's defining property
  * (the KMV of a union is the KMV of the two KMVs) is literally this
  * merge, so the result is independent of partitioning and merge
  * order.
  */
final class KmvBuffer(val k: Int) {
  val set: mutable.TreeSet[Long] = mutable.TreeSet.empty[Long]

  def update(h: Long): Unit =
    if (set.size < k) set += h
    else if (h < set.last && !set.contains(h)) { set -= set.last; set += h }

  def merge(o: KmvBuffer): Unit = o.set.foreach(update)
}

/** `graft_kmv(hash, k)` — the engine's KMV distinct-count sketch as a
  * native mergeable [[TypedImperativeAggregate]]: returns the sorted
  * `ARRAY<BIGINT>` of the ≤ k smallest distinct 60-bit hashes, from
  * which every KMV statistic derives (k_used = size, estimate from the
  * k-th value, set algebra from the union of member lists — q89/q109/
  * q111's math).
  *
  * This replaces the declarative two-level prune those queries carried
  * (per-partition rank → global rank over ≤ k·P rows): the bounded
  * buffer combines map-side, ships ≤ k longs per partition, and needs
  * NO window — in particular no empty-partition global WindowExec,
  * the one warning the declarative form always logged. Deterministic
  * under the md5 hash, so results stay bit-identical to the window
  * plan and the DuckDB oracles are unchanged.
  */
case class Kmv(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k > 0, s"graft_kmv k must be > 0, got $k")

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv expects a BIGINT hash, got $t")
    }
  }

  override def prettyName: String = "graft_kmv"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = child.eval(input)
    if (h != null) buffer.update(h.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KmvBuffer): Any =
    new GenericArrayData(buffer.set.toArray)

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.set.size)
    buffer.set.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new KmvBuffer(k)
    val size = in.readInt()
    var i = 0
    while (i < size) { b.update(in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): Kmv =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Kmv =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Kmv =
    copy(child = newChild)
}
