package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.streaming.Stateful.UserEvent

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState accumulates per-user state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UserEvent]
    val out = Stateful.runningUserStats(stream.toDS())
    val query = out.writeStream.format("memory")
      .queryName("stateful_test").outputMode("append").start()
    try {
      stream.addData(UserEvent(1, 2.0), UserEvent(1, 4.0), UserEvent(2, 10.0))
      query.processAllAvailable()
      stream.addData(UserEvent(1, 6.0))
      query.processAllAvailable()

      val rows = spark.table("stateful_test")
        .as[Stateful.UserRunning].collect()
      // batch 1: user1 n=2 sum=6 mean=3; user2 n=1 sum=10
      assert(rows.exists(r => r.userId == 1 && r.n == 2 && r.sum == 6.0 && r.mean == 3.0))
      assert(rows.exists(r => r.userId == 2 && r.n == 1 && r.sum == 10.0))
      // batch 2 carries user1's state forward: n=3 sum=12 mean=4
      assert(rows.exists(r => r.userId == 1 && r.n == 3 && r.sum == 12.0 && r.mean == 4.0))
    } finally query.stop()
  }
}
