package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one internal hook the engine needs: turning a custom
  * `LogicalPlan` (graft.plans.GraftAsOfJoin) into a DataFrame.
  * `Dataset.ofRows` is `private[sql]`, so this shim lives under
  * `org.apache.spark.sql` — the standard technique for Spark-native
  * libraries that add whole operators (everything else, including the
  * planner Strategy itself, goes through the public
  * `SparkSessionExtensions` API).
  */
object GraftInternal {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(s.asInstanceOf[ClassicSession], plan)

  /** Drain the listener bus so QueryExecutionListener callbacks (e.g.
    * batch `observe` metrics) have fired before reading their results. */
  def waitListeners(s: SparkSession): Unit =
    s.sparkContext.listenerBus.waitUntilEmpty()
}
