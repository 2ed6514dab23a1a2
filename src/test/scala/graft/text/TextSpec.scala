package graft.text

import graft.SparkSpec

class TextSpec extends SparkSpec {

  test("approx_top_k bigram sketch contains the exact top-10 heavy hitters") {
    val exact = TextQueries.ngramCounts(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val approx = TextQueries.ngramTopKSketch(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // frequent-items guarantee: every sufficiently heavy item survives
    // the sketch; on this corpus the default sketch never saturates, so
    // the exact top-10 must be present with exact counts
    exact.take(10).foreach { case (gram, cnt) =>
      assert(approx.contains(gram), s"missing heavy hitter $gram")
      assert(approx(gram) === cnt, s"count drift for $gram")
    }
  }

  test("repetition ratio is 1 - distinct/total and bounded [0, 1)") {
    val rs = TextQueries.repetition(spark, sf).collect()
    assert(rs.nonEmpty)
    rs.foreach { r =>
      val (n, d, ratio) = (r.getInt(1), r.getInt(2), r.getDouble(3))
      assert(d >= 1 && d <= n)
      assert(math.abs(ratio - (1.0 - d.toDouble / n)) < 1e-15)
      assert(ratio >= 0.0 && ratio < 1.0)
    }
    // the corpus contains docs with repeated 3-grams — signal is live
    assert(rs.exists(_.getDouble(3) > 0.0))
  }
}
