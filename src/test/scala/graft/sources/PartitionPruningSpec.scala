package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Partition pruning — the scan eliminator that matters most at 100 TB:
  * a date/key-partitioned layout turns a selective filter into "read 1
  * directory of N" instead of "read everything and filter".
  *
  * Two faces:
  *  - STATIC: a literal predicate on the partition column reaches the
  *    scan as a PartitionFilter (zero data files from other partitions
  *    are even listed);
  *  - DYNAMIC (DPP): the partition filter is only known at runtime from
  *    the dimension side of a join — Spark injects a
  *    dynamicpruning subquery into the fact scan.
  */
class PartitionPruningSpec extends SparkSpec {

  test("static partition pruning: filter on the partition column prunes the scan") {
    val dir = Files.createTempDirectory("graft_part").toFile.getAbsolutePath
    Tables.events(spark, sfDir)
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).where(col("event_type") === "click")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") &&
      plan.contains("isnotnull(event_type") ,
      plan.take(1200))
    // the pruned read only touches the click partition
    val scanned = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scanned.nonEmpty)
    assert(scanned.head.selectedPartitions.partitionCount == 1,
      s"expected exactly the click partition, got ${scanned.head.selectedPartitions.partitionCount}")
  }

  test("dynamic partition pruning: a dimension filter prunes the fact scan at runtime") {
    val dir = Files.createTempDirectory("graft_dpp").toFile.getAbsolutePath
    // fact partitioned by user bucket; dimension maps buckets to a flag
    Tables.events(spark, sfDir)
      .withColumn("user_bkt", pmod(col("user_id"), lit(8L)))
      .write.partitionBy("user_bkt").mode("overwrite").parquet(dir)
    val prior = spark.conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    try {
      import spark.implicits._
      // The dim must be file-backed: over a LocalRelation the selective
      // filter constant-folds away and DPP sees no pruning predicate.
      // Key type Int, matching the inferred partition-directory type — a
      // cast on the partition attribute would disqualify the pruning key.
      val dimDir = Files.createTempDirectory("graft_dpp_dim").toFile.getAbsolutePath
      (0 to 7).map(b => (b, if (b <= 1) "keep" else "drop")).toDF("bkt", "flag")
        .write.mode("overwrite").parquet(dimDir)
      val dim = spark.read.parquet(dimDir)
      val fact = spark.read.parquet(dir)
      val joined = fact.join(dim, col("user_bkt") === col("bkt"))
        .where(col("flag") === "keep")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruningexpression"),
        s"expected a DPP subquery on the fact scan, plan:\n${plan.take(1500)}")
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", v)
      case None => spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    }
  }
}
