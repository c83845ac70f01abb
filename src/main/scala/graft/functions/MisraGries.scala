package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items buffer: at most `capacity` counters plus
  * the exact stream length. The classic guarantee (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012):
  * after any sequence of updates and merges over a stream of length n,
  * every retained counter undercounts its item by at most n/(capacity+1),
  * and any item with true frequency > n/(capacity+1) is guaranteed to be
  * retained. The buffer is a fixed-size value — the shuffle carries at
  * most `capacity` (token, count) pairs per partition regardless of
  * vocabulary size, which is the whole point at 100 TB: a full
  * `groupBy(token)` shuffles the entire vocabulary; this shuffles O(k).
  */
final class MgBuffer(val capacity: Int) {
  var n: Long = 0L
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def update(t: String): Unit = {
    n += 1
    counts.get(t) match {
      case Some(c) => counts.update(t, c + 1)
      case None if counts.size < capacity => counts.update(t, 1L)
      case None =>
        // full and t unseen: decrement every counter (t's implicit
        // counter and the minimum both hit zero), dropping zeros
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace((_, c) => c - 1)
        counts.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(counts.remove)
    }
  }

  /** PODS-2012 merge: add counts pointwise, then if over capacity
    * subtract the (capacity+1)-th largest count from every counter and
    * drop the non-positive ones — error bounds add across merges. */
  def merge(o: MgBuffer): Unit = {
    n += o.n
    o.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > capacity) {
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val sub = sorted(sorted.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - sub)
      counts.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(counts.remove)
    }
  }
}

/** `graft_mg_candidates(token, capacity)` — mergeable Misra-Gries
  * heavy-hitter candidate sketch as a native Catalyst
  * [[TypedImperativeAggregate]].
  *
  * Returns `struct(n BIGINT, candidates ARRAY<STRING>)`: the exact input
  * count and every token the sketch retained, sorted. The CANDIDATE SET
  * is partitioning-dependent (any MG execution retains a superset of the
  * true heavy hitters, but which light tokens ride along depends on
  * merge order), so it is not directly oracle-able — the deterministic
  * pattern is sketch → exact recount of the ≤ capacity candidates →
  * exact threshold filter (q100), whose OUTPUT is exact and
  * partition-order-independent as long as the sketch capacity exceeds
  * the reporting ratio (guarantee above).
  *
  * `capacity` must be a foldable positive INT (it sizes a per-partition
  * in-memory map; 512 counters ≈ 20 KB — the fixed shuffle budget).
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression] {

  require(capacity > 0, s"graft_mg_candidates capacity must be > 0, got $capacity")

  override def prettyName: String = "graft_mg_candidates"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("candidates", ArrayType(StringType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(capacity)

  override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MgBuffer, other: MgBuffer): MgBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: MgBuffer): Any = {
    val cand = buffer.counts.keysIterator.toArray
    java.util.Arrays.sort(cand, implicitly[Ordering[String]])
    InternalRow(buffer.n,
      new GenericArrayData(cand.map(UTF8String.fromString(_: String))))
  }

  override def serialize(buffer: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buffer.n)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new MgBuffer(capacity)
    b.n = in.readLong()
    val size = in.readInt()
    var i = 0
    while (i < size) { b.counts.update(in.readUTF(), in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
