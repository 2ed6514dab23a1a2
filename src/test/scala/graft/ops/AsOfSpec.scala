package graft.ops

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  test("asof join matches latest at-or-before, inclusive at equal time") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, "r5"), (1L, 20L, "r20"), (2L, 9L, "r9"))
      .toDF("k", "rt", "v")
    val out = AsOf.asofJoin(left, right, "k", "t", "rt", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    // (1,10)->r5; (1,20)->r20 (inclusive); (2,5) has no prior row -> dropped
    assert(out === Set((1L, 10L, "a", "r5"), (1L, 20L, "b", "r20")))
  }

  test("a matching right row with a NULL value yields NULL, not an older value") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 1L, Some("old")), (1L, 8L, None: Option[String]))
      .toDF("k", "rt", "v")
    val out = AsOf.asofJoin(left, right, "k", "t", "rt", "v").collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(2), "the t=8 NULL-valued row is the match, not t=1's 'old'")
  }
}
