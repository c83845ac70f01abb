package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** graft_topk (q107's aggregate): heap bounds, the total (score desc,
  * tag asc) order, merge semantics, partition invariance (top-k is
  * mergeable, so the result must not depend on how rows were split),
  * and SQL/null behavior.
  */
class TopKSpec extends SparkSpec {

  test("buffer: keeps exactly the k best pairs under the total order") {
    val b = new TopKBuffer(3)
    Seq((5L, "e"), (9L, "a"), (1L, "z"), (9L, "b"), (7L, "q"), (9L, "c"))
      .foreach { case (s, t) => b.update(s, t) }
    // three 9s beat everything; tie broken by tag asc
    assert(b.sorted.toSeq == Seq((9L, "a"), (9L, "b"), (9L, "c")))
  }

  test("buffer: equal-score ties prefer the smaller tag at the boundary") {
    val b = new TopKBuffer(2)
    b.update(4L, "m")
    b.update(4L, "z")
    b.update(4L, "a") // must evict (4, z), not (4, m)
    assert(b.sorted.toSeq == Seq((4L, "a"), (4L, "m")))
  }

  test("property: heap == brute sorted take-k under arbitrary input and splits") {
    import org.scalacheck.{Gen, Prop}
    val gen = for {
      xs <- Gen.listOf(Gen.zip(
        Gen.chooseNum(-1000L, 1000L), Gen.chooseNum(0, 30).map(i => f"t$i%03d")))
      k <- Gen.chooseNum(1, 8)
      cut <- Gen.chooseNum(0, math.max(0, xs.size))
    } yield (xs, k, cut)
    val prop = Prop.forAll(gen) { case (xs, k, cut) =>
      val brute = xs.sortBy { case (s, t) => (-s, t) }.take(k)
      val direct = new TopKBuffer(k); xs.foreach(e => direct.update(e._1, e._2))
      val (a, b) = xs.splitAt(cut)
      val m1 = new TopKBuffer(k); a.foreach(e => m1.update(e._1, e._2))
      val m2 = new TopKBuffer(k); b.foreach(e => m2.update(e._1, e._2))
      m1.merge(m2)
      direct.sorted.toSeq == brute && m1.sorted.toSeq == brute
    }
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("buffer: merge equals update over the concatenated stream") {
    val xs = (0 until 50).map(i => ((i * 37 % 101).toLong, s"x$i"))
    val ys = (0 until 50).map(i => ((i * 53 % 101).toLong, s"y$i"))
    val merged = new TopKBuffer(7); val direct = new TopKBuffer(7)
    val b2 = new TopKBuffer(7)
    xs.foreach { case (s, t) => merged.update(s, t) }
    ys.foreach { case (s, t) => b2.update(s, t) }
    merged.merge(b2)
    (xs ++ ys).foreach { case (s, t) => direct.update(s, t) }
    assert(merged.sorted.toSeq == direct.sorted.toSeq)
  }

  test("aggregate: output is partition-invariant and matches a window plan") {
    import spark.implicits._
    val data = (0 until 500)
      .map(i => (s"g${i % 3}", (i * 41 % 97).toLong, f"tag$i%04d"))
      .toDF("g", "s", "t")
    def viaAgg(parts: Int): Seq[(String, Long, String)] =
      data.repartition(parts).groupBy(col("g"))
        .agg(call_function("graft_topk", col("s"), col("t"), lit(4)).as("tk"))
        .select(col("g"), explode(col("tk")).as("e"))
        .select(col("g"), col("e.score"), col("e.tag"))
        .as[(String, Long, String)].collect().toSeq.sorted
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("t"))
      data.withColumn("rn", row_number().over(w)).where(col("rn") <= 4)
        .select(col("g"), col("s"), col("t"))
        .as[(String, Long, String)].collect().toSeq.sorted
    }
    assert(viaAgg(1) == viaWindow)
    assert(viaAgg(2) == viaWindow)
    assert(viaAgg(13) == viaWindow)
  }

  test("aggregate: works in plain SQL; null scores and tags are skipped") {
    import spark.implicits._
    Seq((Some(3L), Some("a")), (None, Some("b")), (Some(9L), None),
      (Some(5L), Some("c")), (Some(1L), Some("d")))
      .toDF("s", "t").createOrReplaceTempView("tk_in")
    val out = spark.sql(
      "SELECT graft_topk(s, t, 2) AS tk FROM tk_in")
      .selectExpr("inline(tk)").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((5L, "c"), (3L, "a")))
  }

  test("q107: the plan is two aggregates, no window sort of the group") {
    val df = graft.SparkEntry.queries("q107_group_topk")(spark, sfDir)
    val p = df.queryExecution.sparkPlan
    val windows = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, "top-k must come from the heap aggregate, not a window")
    val aggs = p.collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    assert(aggs.nonEmpty)
  }
}
