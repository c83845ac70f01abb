package graft.queries

import graft.SparkSpec

class ApproxDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct lands within the default 5% rsd of exact") {
    val rows = WindowQueries.approxDistinct(spark, sfDir)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, approx, exact) =>
      val err = math.abs(approx - exact).toDouble / math.max(exact, 1L)
      assert(err <= 0.15, s"$et: approx=$approx exact=$exact err=$err")
    }
  }
}
