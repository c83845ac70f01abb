package graft

import org.apache.spark.sql.DataFrame

/** Both branches of the measured gate, plus the laziness contract: the
  * untaken branch must never be constructed (its plan would be
  * analyzed, and for q30's brute branch that plan is an all-pairs
  * join someone could accidentally force).
  */
class GateSpec extends SparkSpec {

  private def df(n: Int): DataFrame = {
    val s = spark
    import s.implicits._
    (1 to n).toDF("x")
  }

  test("at or under the gate the small branch runs; large is never built") {
    var smallBuilt = 0
    var largeBuilt = 0
    val out = Gate.byCount(df(5), 5L) {
      smallBuilt += 1; df(1)
    } {
      largeBuilt += 1; df(2)
    }
    assert(out.count() == 1L)
    assert(smallBuilt == 1 && largeBuilt == 0)
  }

  test("over the gate the large branch runs; small is never built") {
    var smallBuilt = 0
    var largeBuilt = 0
    val out = Gate.byCount(df(6), 5L) {
      smallBuilt += 1; df(1)
    } {
      largeBuilt += 1; df(2)
    }
    assert(out.count() == 2L)
    assert(smallBuilt == 0 && largeBuilt == 1)
  }

  test("q30 and q73 both route through the gate (source-level contract)") {
    // cheap guard against the idiom drifting back to inline if/else:
    // the two call sites name Gate.byCount explicitly
    val sim = scala.io.Source.fromFile(
      "src/main/scala/graft/queries/SimilarityQueries.scala", "UTF-8").mkString
    val ded = scala.io.Source.fromFile(
      "src/main/scala/graft/queries/DedupQueries.scala", "UTF-8").mkString
    assert(sim.contains("Gate.byCount"), "q30 gate must use Gate.byCount")
    assert(ded.contains("Gate.byCount"), "q73 gate must use Gate.byCount")
  }
}
