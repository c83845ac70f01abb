package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** AQE skew-join demo (ROADMAP item 7): q51 demonstrates MANUAL salting;
  * this spec documents the AUTOMATIC path — AQE detecting a skewed
  * shuffle partition at runtime and splitting it — with thresholds tuned
  * down so a test-sized skew triggers it. At 100 TB the same two dials
  * (skewedPartitionThresholdInBytes, advisoryPartitionSizeInBytes) are
  * the production knobs.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed shuffle partition in a sort-merge join") {
    val confs = Seq(
      // enough partitions that the skewed one towers over the MEDIAN
      // (skew detection is size > max(threshold, factor × median); with
      // the suite's 2 partitions the median IS the skewed partition)
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 100k rows, ~90% on key 0 → one shuffle partition dwarfs the rest
      val skewed = spark.range(100000)
        .select((when(rand(7) < 0.9, 0L).otherwise(col("id") % 50L)).as("k"),
          concat(lit("payload-"), col("id")).as("payload"))
      val dim = spark.range(50).select(col("id").as("k"),
        concat(lit("name-"), col("id")).as("name"))
      val joined = skewed.join(dim, "k")
      // collect() is the one action bound to THIS DataFrame's
      // QueryExecution (write/count/foreach each build their own), so
      // after it the inspected plan is AQE's final one
      assert(joined.collect().length == 100000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join, plan:\n${plan.take(1500)}")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
