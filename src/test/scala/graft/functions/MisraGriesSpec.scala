package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** graft_mg_candidates (q100's sketch half): the Misra-Gries retention
  * guarantee, merge semantics, serialization, and the invariance that
  * makes the two-pass heavy-hitter query deterministic — the FINAL
  * exact-recount output does not depend on how the input was
  * partitioned, even though the candidate set itself may.
  */
class MisraGriesSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("buffer: retention guarantee — freq > n/(k+1) always retained") {
    // stream: 'hot' 40 times, 120 distinct light tokens once each, in an
    // adversarial order (light tokens flushed through a capacity-8 buffer)
    val stream = new scala.util.Random(7).shuffle(
      (Seq.fill(40)("hot") ++ (0 until 120).map(i => s"light$i")).toList)
    val b = new MgBuffer(8)
    stream.foreach(b.update)
    assert(b.n == 160)
    // hot freq 40 > 160/9 ≈ 17.8 → must be retained, undercount ≤ n/(k+1)
    assert(b.counts.contains("hot"))
    assert(b.counts("hot") >= 40 - 160 / 9)
  }

  test("property: retention and undercount bounds hold under arbitrary input/splits") {
    import org.scalacheck.{Gen, Prop}
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(0, 40).map(i => s"t$i"))
      k <- Gen.chooseNum(2, 12)
      cut <- Gen.chooseNum(0, math.max(0, xs.size))
    } yield (xs, k, cut)
    val prop = Prop.forAll(gen) { case (xs, k, cut) =>
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = xs.size.toLong
      def holds(b: MgBuffer, rounds: Int): Boolean =
        b.n == n && b.counts.size <= k &&
          truth.forall { case (t, f) =>
            // MG guarantee (error adds across merges: rounds × n/(k+1))
            val err = rounds * (n / (k + 1) + 1)
            val kept = b.counts.getOrElse(t, 0L)
            kept <= f && (f <= err || b.counts.contains(t))
          }
      val direct = new MgBuffer(k); xs.foreach(direct.update)
      val (a, bb) = xs.splitAt(cut)
      val m1 = new MgBuffer(k); a.foreach(m1.update)
      val m2 = new MgBuffer(k); bb.foreach(m2.update)
      m1.merge(m2)
      holds(direct, 1) && holds(m1, 2)
    }
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("buffer: merge keeps guarantee and bounds size") {
    val b1 = new MgBuffer(8); val b2 = new MgBuffer(8)
    (0 until 30).foreach(_ => b1.update("hot"))
    (0 until 40).foreach(i => b1.update(s"a$i"))
    (0 until 30).foreach(_ => b2.update("hot"))
    (0 until 40).foreach(i => b2.update(s"b$i"))
    b1.merge(b2)
    assert(b1.n == 140)
    assert(b1.counts.size <= 8)
    // hot freq 60 > 140/9 → survives the capacity-trim subtraction
    assert(b1.counts.contains("hot"))
  }

  test("aggregate: exact heavy-hitter output is partition-invariant") {
    import spark.implicits._
    val data = (Seq.fill(50)("x") ++ Seq.fill(20)("y") ++
      (0 until 200).map(i => s"t$i")).toDF("t")
    def hh(parts: Int): Seq[(String, Long)] = {
      val tok = data.repartition(parts)
      val sk = tok
        .agg(call_function("graft_mg_candidates", col("t"), lit(16)).as("mg"))
        .select(col("mg.n"), col("mg.candidates")).head()
      val n = sk.getLong(0)
      val cand = sk.getSeq[String](1)
      assert(cand.size <= 16)
      tok.where(col("t").isInCollection(cand))
        .groupBy("t").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") * 8 > lit(n)) // report freq > n/8
        .orderBy(desc("cnt"), col("t"))
        .as[(String, Long)].collect().toSeq
    }
    // n = 270, n/8 = 33.75 → only x (50) qualifies; y (20) does not
    assert(hh(1) == Seq(("x", 50L)))
    assert(hh(2) == hh(1))
    assert(hh(7) == hh(1))
  }

  test("q100 second pass: candidate filter sits below a partial-aggregated groupBy") {
    val df = graft.SparkEntry.queries("q100_heavy_hitters")(spark, sfDir)
    val p = df.queryExecution.sparkPlan
    // the returned frame IS the recount pass (the sketch already ran at
    // construction); its scan must die into the bounded candidate filter
    // before any aggregate — the full vocabulary never rides the shuffle
    val aggs = p.collect {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
      case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => o
    }
    assert(aggs.size >= 2, s"expected partial+final recount aggregates:\n${p.toString.take(1200)}")
    val s = p.toString
    assert(s.contains("INSET") || s.contains(" IN "),
      s"candidate membership filter missing from the recount plan:\n${s.take(1200)}")
    // and the membership test rides 8-byte hashes, not strings: the
    // filter input is graft_h60(t), so the INSET compares longs
    assert(s.contains("graft_h60"),
      s"recount filter should compare h60 longs, not raw tokens:\n${s.take(1200)}")
  }

  test("aggregate: works in plain SQL and null inputs are skipped") {
    import spark.implicits._
    Seq(Some("a"), None, Some("a"), Some("b"))
      .toDF("t").createOrReplaceTempView("mg_in")
    val r = spark.sql(
      "SELECT graft_mg_candidates(t, 4) AS mg FROM mg_in").head()
    val row = r.getStruct(0)
    assert(row.getLong(0) == 3) // null skipped
    assert(row.getList[String](1).asScala == Seq("a", "b"))
  }
}
