package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k buffer over (score BIGINT, tag STRING) pairs, ordered
  * by (score desc, tag asc). A size-k min-heap: update is O(log k),
  * merge is O(k log k), and the buffer that rides the shuffle is ≤ k
  * pairs — the whole point versus the window-sort plan
  * (`row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k`), which
  * sorts EVERY row of every group. Top-k is trivially mergeable
  * (top-k of a union ⊆ union of top-ks), so the result is independent
  * of partitioning and merge order — exact-oracle-able against the
  * window plan as long as the (score, tag) order is total, which the
  * tag tiebreak makes it.
  */
final class TopKBuffer(val k: Int) {
  // dequeues the WORST retained pair first (min score, then max tag)
  private val worstFirst: Ordering[(Long, String)] = new Ordering[(Long, String)] {
    def compare(x: (Long, String), y: (Long, String)): Int = {
      val c = java.lang.Long.compare(y._1, x._1)
      if (c != 0) c else x._2.compareTo(y._2)
    }
  }
  val heap: mutable.PriorityQueue[(Long, String)] =
    mutable.PriorityQueue.empty(worstFirst)

  def update(score: Long, tag: String): Unit =
    if (heap.size < k) heap.enqueue((score, tag))
    else if (worstFirst.compare((score, tag), heap.head) < 0) {
      heap.dequeue(); heap.enqueue((score, tag))
    }

  def merge(o: TopKBuffer): Unit = o.heap.foreach(e => update(e._1, e._2))

  /** Retained pairs, best first (score desc, tag asc). */
  def sorted: Array[(Long, String)] =
    heap.toArray.sortBy { case (s, t) => (-s, t) }
}

/** `graft_topk(score, tag, k)` — per-group top-k as a native mergeable
  * [[TypedImperativeAggregate]]: returns
  * `ARRAY<STRUCT<score BIGINT, tag STRING>>`, the k largest scores
  * (ties broken by tag ascending), best first.
  *
  * This replaces the two most common window-sort plans — global and
  * per-group top-k — with a bounded aggregate: partial buffers of ≤ k
  * pairs combine map-side, so a group with 10⁹ rows ships k pairs per
  * partition instead of sorting 10⁹ rows in one task's window. `k`
  * must be a foldable positive INT (it sizes the per-partition heap).
  * Null scores/tags are skipped, matching the window plan over
  * NULL-free input.
  */
case class TopK(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, s"graft_topk k must be > 0, got $k")

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (LongType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk expects (BIGINT score, STRING tag), got ($l, $r)")
    }
  }

  override def prettyName: String = "graft_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("tag", StringType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = left.eval(input)
    val t = right.eval(input)
    if (s != null && t != null)
      buffer.update(s.asInstanceOf[Long], t.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (s, t) =>
      InternalRow(s, UTF8String.fromString(t))
    })

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val elems = buffer.sorted
    out.writeInt(elems.length)
    // int length + raw UTF-8 (writeUTF caps at 64 KiB modified-UTF-8
    // and the function is registered engine-wide — tags can be long)
    elems.foreach { case (s, t) =>
      out.writeLong(s)
      val tb = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(tb.length)
      out.write(tb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new TopKBuffer(k)
    val size = in.readInt()
    var i = 0
    while (i < size) {
      val s = in.readLong()
      val tb = new Array[Byte](in.readInt())
      in.readFully(tb)
      b.update(s, new String(tb, java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopK =
    copy(left = newLeft, right = newRight)
}
