package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** graft_kmv (q89/q109/q111's sketch half): the buffer keeps exactly
  * the k smallest DISTINCT hashes, the merge is the k-bounded set
  * union (KMV's defining property), and the aggregate's output is
  * invariant to partitioning — which is what lets it replace the
  * declarative two-level rank prune bit-for-bit.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("buffer: k smallest distinct values, duplicates ignored") {
    val b = new KmvBuffer(4)
    Seq(90L, 10L, 50L, 10L, 70L, 30L, 30L, 20L).foreach(b.update)
    assert(b.set.toSeq == Seq(10L, 20L, 30L, 50L))
  }

  test("buffer: merge equals the KMV of the union") {
    val all = (1L to 100L).map(i => i * 7919L % 1000L).distinct
    val (xs, ys) = all.splitAt(37)
    val b1 = new KmvBuffer(8); xs.foreach(b1.update)
    val b2 = new KmvBuffer(8); ys.foreach(b2.update)
    b1.merge(b2)
    val direct = new KmvBuffer(8); all.foreach(direct.update)
    assert(b1.set.toSeq == direct.set.toSeq)
    assert(b1.set.size <= 8)
  }

  test("aggregate: partition-invariant, sorted, null-skipping; equals brute") {
    val vals: Seq[java.lang.Long] =
      (1L to 500L).map(i => java.lang.Long.valueOf(i * 2654435761L % 100000L)) ++
        Seq(null.asInstanceOf[java.lang.Long])
    val brute = vals.filter(_ != null).map(_.toLong)
      .distinct.sorted.take(64)
    val results = Seq(1, 7, 32).map { parts =>
      vals.toDF("h").repartition(parts)
        .agg(call_function("graft_kmv", col("h"), lit(64)).as("sk"))
        .selectExpr("sk").as[Seq[Long]].head()
    }
    results.foreach(r => assert(r == brute, "sketch differs from brute"))
    assert(results.distinct.size == 1, "sketch depends on partitioning")
  }

  test("property: sketch == sorted distinct take-k under arbitrary input and splits") {
    import org.scalacheck.{Gen, Prop}
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
      k <- Gen.chooseNum(1, 16)
      cut <- Gen.chooseNum(0, math.max(0, xs.size))
    } yield (xs, k, cut)
    val prop = Prop.forAll(gen) { case (xs, k, cut) =>
      val brute = xs.distinct.sorted.take(k)
      val direct = new KmvBuffer(k); xs.foreach(direct.update)
      val (a, b) = xs.splitAt(cut)
      val m1 = new KmvBuffer(k); a.foreach(m1.update)
      val m2 = new KmvBuffer(k); b.foreach(m2.update)
      m1.merge(m2)
      direct.set.toList == brute && m1.set.toList == brute
    }
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("SQL registration and analysis-time argument validation") {
    spark.range(200).selectExpr("id * 37 % 50 AS h")
      .createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      "SELECT graft_kmv(h, 8) AS sk FROM kmv_in").as[Seq[Long]].head()
    assert(viaSql == (0L until 50L).filter(h =>
      (0L until 200L).exists(i => i * 37 % 50 == h)).sorted.take(8))
    intercept[Exception] {
      spark.sql("SELECT graft_kmv(h) FROM kmv_in").collect()
    }
    intercept[Exception] {
      // k must be a literal, not a column
      spark.sql("SELECT graft_kmv(h, CAST(h AS INT)) FROM kmv_in").collect()
    }
  }
}
