package graft.ml

import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.linalg.SparseVector
import graft.SparkSpec

/** Pins HashingTF's bucketing (murmur3, seed 42, numFeatures 2500 — the
  * reference's exact configuration, `SGDC/sgdc.py:64`). These indices are
  * regression goldens: if MLlib ever changed its hash seed or algorithm,
  * incremental models trained across versions would silently disagree.
  */
class HashingTFSpec extends SparkSpec {
  import spark.implicits._

  private val htf = new HashingTF().setNumFeatures(2500)
    .setInputCol("toks").setOutputCol("tf")

  private val golden = Map(
    "spark" -> 786, "streaming" -> 1335, "data" -> 1695,
    "run" -> 266, "good" -> 1168, "bad" -> 456)

  test("token buckets match murmur3(seed=42) mod 2500 goldens") {
    for ((tok, idx) <- golden) assert(htf.indexOf(tok) == idx, tok)
  }

  test("transform counts term frequencies into the golden buckets") {
    val v = htf.transform(Seq(Tuple1(Seq("spark", "spark", "data"))).toDF("toks"))
      .select("tf").head().getAs[SparseVector](0)
    assert(v.size == 2500)
    assert(v(786) == 2.0 && v(1695) == 1.0)
    assert(v.indices.length == 2)
  }

  test("all buckets stay within [0, 2500)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val w = (1 to (1 + rnd.nextInt(10)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val i = htf.indexOf(w)
      assert(i >= 0 && i < 2500, w)
    }
  }
}
