package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_probe(bloomBytes BINARY literal, key BIGINT)` — membership
  * probe against a pre-built [[org.apache.spark.util.sketch.BloomFilter]]
  * (the public sketch `DataFrameStatFunctions.bloomFilter` produces;
  * `writeTo`/`readFrom` round-trip its bitset). One-sided: `false` means
  * the key is definitely absent, `true` means probably present — so it is
  * a PRE-filter for an exact join, never a join replacement (q115).
  *
  * The bloom bytes are a constructor parameter, not a child expression:
  * a child literal would be re-evaluated per row by generated code and
  * would defeat the one-time deserialization. The builder in
  * [[graft.GraftExtensions]] folds the binary literal at resolution time;
  * the deserialized filter is lazily rebuilt once per executor (it rides
  * the serialized expression inside the task binary, the same transport
  * Spark's own InjectRuntimeFilter uses for its bloom subquery results —
  * a few MB for a 10M-key dim side, far below a hash-relation broadcast
  * of the same keys) and enters generated code as a codegen reference
  * object, so the per-row work is one `mightContainLong`.
  */
case class BloomProbe(bytes: Array[Byte], child: Expression)
  extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_probe expects a BIGINT key, got $t")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_probe"

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  // Array[Byte] as a case-class field would give equals/hashCode ARRAY
  // REFERENCE identity — two identical probes would never compare equal,
  // defeating expression canonicalization, semanticEquals, and
  // subexpression elimination. Compare byte CONTENT instead.
  override def equals(other: Any): Boolean = other match {
    case BloomProbe(b, c) => java.util.Arrays.equals(bytes, b) && child == c
    case _ => false
  }

  override def hashCode(): Int =
    31 * java.util.Arrays.hashCode(bytes) + child.hashCode()

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}
