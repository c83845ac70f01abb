package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.streaming.Stateful.UserEvent

/** transformWithState (state API v2) requires the RocksDB state store —
  * configured per-query via the provider option here.
  */
class StatefulV2Spec extends SparkSpec {
  import spark.implicits._

  test("transformWithState accumulates per-user state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[UserEvent]
      val query = StatefulV2.runningUserStats(stream.toDS())
        .writeStream.format("memory").queryName("tws_test")
        .outputMode("append").start()
      try {
        stream.addData(UserEvent(1, 2.0), UserEvent(1, 4.0), UserEvent(2, 10.0))
        query.processAllAvailable()
        stream.addData(UserEvent(1, 6.0))
        query.processAllAvailable()
        val rows = spark.table("tws_test").as[Stateful.UserRunning].collect()
        assert(rows.exists(r => r.userId == 1 && r.n == 2 && r.sum == 6.0))
        assert(rows.exists(r => r.userId == 2 && r.n == 1 && r.sum == 10.0))
        assert(rows.exists(r => r.userId == 1 && r.n == 3 && r.sum == 12.0 && r.mean == 4.0))
      } finally query.stop()
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
