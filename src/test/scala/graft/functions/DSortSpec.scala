package graft.functions

/** The sortable-bits codec must be exactly order-isomorphic to
  * java.lang.Double's total order and exactly invertible — the two
  * properties that let a DOUBLE ranking ride TopK's BIGINT heap
  * without changing any audit's admitted set. */
class DSortSpec extends graft.SparkSpec {

  test("enc is order-isomorphic to Double.compare, dec inverts enc") {
    val rnd = new scala.util.Random(20260814L)
    def draw(): Double = rnd.nextInt(6) match {
      case 0 => rnd.nextDouble()
      case 1 => -rnd.nextDouble()
      case 2 => java.lang.Double.longBitsToDouble(rnd.nextLong()) // any bits
      case 3 => rnd.nextGaussian() * math.pow(10, rnd.nextInt(300) - 150)
      case 4 => Seq(0.0, -0.0, Double.MinPositiveValue,
        -Double.MinPositiveValue, Double.MaxValue, -Double.MaxValue,
        Double.PositiveInfinity, Double.NegativeInfinity)(rnd.nextInt(8))
      case _ => rnd.nextLong().toDouble
    }
    (1 to 20000).foreach { _ =>
      val a = draw(); val b = draw()
      assert(java.lang.Long.compare(DSortCodec.enc(a), DSortCodec.enc(b))
          .sign == java.lang.Double.compare(a, b).sign,
        s"order broke for ($a, $b)")
      assert(java.lang.Double.doubleToLongBits(DSortCodec.dec(DSortCodec.enc(a))) ==
        java.lang.Double.doubleToLongBits(a), s"round-trip broke for $a")
    }
  }

  test("edge ordering: -inf < -0.0 < +0.0 < +inf < NaN; negation is safe") {
    val es = Seq(Double.NegativeInfinity, -1.5, -0.0, 0.0, 1.5,
      Double.PositiveInfinity, Double.NaN).map(DSortCodec.enc)
    assert(es == es.sorted)
    // no real double encodes to Long.MinValue, so -enc never overflows
    // (knnBruteL2 negates the encoding for its ascending-L2 heap)
    es.foreach(e => assert(e != Long.MinValue))
  }

  test("the SQL surface round-trips and sorts like ORDER BY") {
    import spark.implicits._
    val xs = Seq(3.25, -7.5, 0.0, 99.125, -1e300, 1e-300)
    val got = xs.toDF("d")
      .selectExpr("graft_dsort_inv(graft_dsort(d)) AS r", "graft_dsort(d) AS s")
      .orderBy("s").select("r").as[Double].collect().toSeq
    assert(got == xs.sortBy(identity))
  }
}
