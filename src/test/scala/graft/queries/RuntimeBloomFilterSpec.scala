package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Runtime bloom-filter join pruning — the ROW-level cousin of dynamic
  * partition pruning: when a shuffle join's small side carries a
  * selective filter, Catalyst builds a bloom filter over its join keys
  * and injects `might_contain` onto the big side's scan, so most fact
  * rows die at the scan instead of riding the shuffle. At 100 TB this
  * is the difference between shuffling the whole fact table and
  * shuffling the ~matching fraction.
  *
  * The thresholds below only UNGATE the existing optimizer rule at
  * test scale (the defaults require a 10 GB application side); nothing
  * engine-side is patched, which is the point — a declarative plan
  * gets this for free on a real cluster.
  */
class RuntimeBloomFilterSpec extends SparkSpec {

  private def withConfs[T](kvs: (String, String)*)(body: => T): T = {
    val priors = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally priors.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects might_contain on the fact side of a shuffle join") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // defaults gate on a >=10 GB application-side scan; ungate for testdata
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force a shuffle join: with a broadcast the rule (rightly) sees no benefit
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"
    ) {
      val li = Tables.lineitem(spark, sfDir)
      val ord = Tables.orders(spark, sfDir)
        .where(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("qty"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom filter injected:\n${optimized.take(2000)}")
      // and it still computes the right thing (sanity vs the unfiltered plan)
      val expected = withConfs(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("qty"))
          .collect().toSeq
      }
      assert(j.collect().toSeq == expected)
    }
  }
}
