package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Map-type scalar function coverage (no DuckDB oracle — MAP dialects
  * diverge; semantics pinned here instead).
  */
class MapFuncsSpec extends SparkSpec {

  test("map construction, lookup, keys/values, concat, transform_values") {
    val df = Tables.documents(spark, sf)
      .where(size(split(col("text"), " ")) >= 5) // precondition for the 5-word slice
      .orderBy("doc_id")
      .limit(10)
      .withColumn("ws", slice(split(col("text"), " "), 1, 5))
      .withColumn("m", map_from_arrays(
        expr("transform(sequence(0, size(ws) - 1), i -> concat('w', i))"), col("ws")))
    val rows = df.select(
      col("doc_id"),
      map_keys(col("m")).as("ks"),
      map_values(col("m")).as("vs"),
      element_at(col("m"), "w0").as("first"),
      expr("transform_values(m, (k, v) -> length(v))").as("lens"),
      map_concat(col("m"), map(lit("extra"), lit("x"))).as("m2"))
      .collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val ks = r.getSeq[String](1)
      val vs = r.getSeq[String](2)
      assert(ks.length === 5 && vs.length === 5)
      assert(r.getString(3) === vs.head) // element_at("w0") = first word
      val lens = r.getMap[String, Int](4)
      assert(ks.forall(k => lens(k) === vs(ks.indexOf(k)).length))
      assert(r.getMap[String, String](5).contains("extra"))
    }
  }

  test("unionByName aligns differing column orders") {
    import spark.implicits._
    val a = Seq((1, "x")).toDF("id", "name")
    val b = Seq(("y", 2)).toDF("name", "id")
    val u = a.unionByName(b).collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(u === Set((1, "x"), (2, "y")))
  }
}
