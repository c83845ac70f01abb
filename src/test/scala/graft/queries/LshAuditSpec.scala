package graft.queries

import graft.SparkSpec

/** q142: the audit's two arms must agree with the queries they audit —
  * total true pairs equals q25's row count, total found equals q27's
  * (LSH-verified ⊆ exact, so found counts are bounded per bucket), and
  * the bucket arithmetic is the exact integer form of the jaccard. */
class LshAuditSpec extends SparkSpec {

  test("q142: totals tie out against q25/q27 and buckets are sane") {
    val audit = DedupQueries.lshAudit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(audit.nonEmpty, "sf0.001 must surface near-dup pairs")
    audit.foreach { case (b, nPairs, nFound) =>
      assert(b >= 10L && b <= 20L, s"bucket $b outside [0.5,1.0] range")
      assert(nFound >= 0L && nFound <= nPairs,
        s"bucket $b: found $nFound exceeds pairs $nPairs")
    }
    val exact = DedupQueries.ngramJaccard(spark, sfDir).count()
    val lsh = DedupQueries.minhashNearDup(spark, sfDir).count()
    assert(audit.map(_._2).sum == exact,
      "audit's ground-truth arm must equal q25's pair count")
    assert(audit.map(_._3).sum == lsh,
      "audit's found arm must equal q27's pair count")
    // exact-1.0 pairs collide in every band — bucket 20 recall is total
    audit.find(_._1 == 20L).foreach { case (_, np, nf) =>
      assert(np == nf, "identical-shingle-set pairs must always be found")
    }
  }
}
