package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.{SparkSpec, Tables}

/** Property tests for the scale utilities: the rewrites they perform
  * (salting, fan-out) must be answer-preserving for ANY input, not just
  * the shipped corpora — including empty inputs, all-one-key skew, and
  * negative values. (Plain ScalaCheck generators from fixed seeds, as in
  * MapReducePropertySpec.)
  */
class ScalePropertySpec extends SparkSpec {

  // keys drawn from a tiny domain → heavy collision/skew by construction;
  // values in cents to keep the decimal-sum comparison exact
  private val pairs: Gen[List[(String, Double)]] =
    Gen.choose(0, 80).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.oneOf("hot", "warm", "cold"), Gen.choose(-5000, 5000).map(_ / 100.0))))

  private def samples(n: Int): Seq[List[(String, Double)]] =
    (1 to n).map(i => pairs.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("salted sum equals the direct groupBy for arbitrary skewed inputs") {
    import spark.implicits._
    samples(8).foreach { rows =>
      val df = rows.toDF("k", "v")
      val salted = Scale.saltedSum(df, col("k"), col("v"))
        .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
      val direct = df.groupBy("k")
        .agg(sum(col("v").cast("decimal(18,2)")).cast("double").as("t"),
          count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
      assert(salted === direct, s"input: $rows")
    }
  }

  test("fanOut preserves the exact multiset of rows for arbitrary inputs") {
    import spark.implicits._
    samples(8).foreach { rows =>
      // write as one file so the single-file engage path is exercised
      val path = s"${Tables.scratchDir}/fanout-prop"
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(path)
      val src = spark.read.parquet(path)
      val fanned = Tables.fanOut(src, col("k"))
      val a = fanned.collect().map(r => (r.getString(0), r.getDouble(1)))
        .groupBy(identity).view.mapValues(_.length).toMap
      val b = src.collect().map(r => (r.getString(0), r.getDouble(1)))
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(a === b, s"input: $rows")
    }
  }
}
