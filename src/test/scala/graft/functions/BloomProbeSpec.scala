package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** graft_bloom_probe (q115's pre-filter): the one-sidedness contract —
  * a key that was put in the bloom NEVER probes false (so the pre-filter
  * cannot lose a join partner), false positives stay near the requested
  * fpp (so the pre-filter actually prunes), and the builder rejects
  * malformed calls at analysis time rather than at execution.
  */
class BloomProbeSpec extends SparkSpec {
  import spark.implicits._

  private def bloomBytes(keys: Seq[Long], fpp: Double): Array[Byte] = {
    val bf = keys.toDF("k").stat.bloomFilter("k", keys.size.toLong, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  test("no false negatives: every inserted key probes true") {
    val keys = (0L until 1000L).map(k => k * 2654435761L)
    val bytes = bloomBytes(keys, 0.01)
    val hits = keys.toDF("k")
      .where(call_function("graft_bloom_probe", lit(bytes), col("k")))
      .count()
    assert(hits == keys.size.toLong,
      "a bloom false negative would silently drop true join partners")
  }

  test("false-positive rate stays near the requested 1%") {
    val members = (0L until 1000L).map(k => k * 2654435761L)
    val bytes = bloomBytes(members, 0.01)
    val nonMembers = (1L to 10000L).map(k => k * 40503L + 7L)
      .filterNot(members.toSet)
    val fp = nonMembers.toDF("k")
      .where(call_function("graft_bloom_probe", lit(bytes), col("k")))
      .count()
    assert(fp.toDouble / nonMembers.size < 0.05,
      s"fpp ${fp.toDouble / nonMembers.size} — filter is not pruning")
  }

  test("null key probes null; non-BIGINT key and non-literal bloom fail analysis") {
    val bytes = bloomBytes(Seq(1L, 2L), 0.01)
    val r = spark.range(1)
      .select(call_function("graft_bloom_probe", lit(bytes),
        lit(null).cast("long")).as("v"))
      .collect()
    assert(r.head.isNullAt(0), "null-safe eval must propagate null")

    intercept[Exception] {
      spark.range(1)
        .select(call_function("graft_bloom_probe", lit(bytes), lit("abc")))
        .collect()
    }
    intercept[Exception] {
      // bloom must be a foldable BINARY literal — a column is rejected
      Seq((Array[Byte](1, 2), 1L)).toDF("b", "k")
        .select(call_function("graft_bloom_probe", col("b"), col("k")))
        .collect()
    }
  }
}
