package graft.dedup

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  test("minhash LSH + exact verify finds exactly the exact-jaccard pairs") {
    val exact = DedupQueries.ngramJaccard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupQueries.minhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain injected near-dups")
    assert(lsh === exact)
  }

  test("simhash (hamming <= 7) recalls most jaccard >= 0.5 pairs") {
    val jac = DedupQueries.ngramJaccard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = DedupQueries.simhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // simhash thresholds a different similarity than jaccard: short docs
    // (few shingles) have noisy sketch bits, so perfect agreement is not
    // expected — measure recall instead (observed: 23/25 on this corpus)
    val recall = jac.count(sim.contains).toDouble / jac.size
    info(f"simhash recall of jaccard>=0.5 pairs = $recall%.2f")
    assert(recall >= 0.8, s"recall $recall; missing ${jac.diff(sim)}")
  }

  test("minhash plan never falls back to a nested-loop or cartesian join") {
    val plan = DedupQueries.minhashLsh(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("exact dedup keeps one keeper per distinct text") {
    val df = DedupQueries.exact(spark, sf)
    val total = graft.Tables.documents(spark, sf).count()
    assert(df.selectExpr("sum(n_copies)").head.getLong(0) === total)
  }
}
