package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Bucketed fact-fact co-location (VERDICT r1 item 9): lineitem and
  * orders written bucketed+sorted on the order key join with NO shuffle
  * exchange on either side — the plan shape that survives a 100× scale-up
  * of both fact tables.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two bucketed tables has no shuffle exchange") {
    val wh = Files.createTempDirectory("graft_bucketed").toFile
    val priorThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable broadcast so the tiny sf0.001 tables exercise the
    // sort-merge path a real fact-fact join would take
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketed.writeBucketed(Tables.lineitem(spark, sfDir), "li_bkt",
        s"${wh.getAbsolutePath}/li", "l_orderkey", 4)
      Bucketed.writeBucketed(Tables.orders(spark, sfDir), "ord_bkt",
        s"${wh.getAbsolutePath}/ord", "o_orderkey", 4)
      val joined = Bucketed.coLocatedJoin(spark, "li_bkt", "ord_bkt",
          "l_orderkey", "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      joined.collect() // execute so AQE finalizes the physical plan
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeLike => e
      }
      // the only legal shuffle is the one UNDER the final aggregation;
      // the join itself must read co-located buckets directly
      assert(shuffles.size <= 1,
        s"expected no join-side shuffle, plan:\n${joined.queryExecution.executedPlan}")
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("SortMergeJoin"), planStr.take(800))
      // cross-check the result against the unbucketed join
      val plain = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      assert(joined.orderBy("o_orderpriority").collect().toSeq ==
        plain.orderBy("o_orderpriority").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThresh)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
