package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.{SparkSpec, Tables}

/** Property tests for the MV rewrite: answer preservation must hold for
  * ANY source data, not just the shipped corpora — the exhaustive
  * ON==OFF sweeps (SummaryRewriteSweepSpec) fix the data and vary the
  * query shape; this spec fixes the shapes and varies the DATA through
  * the hostile corners a warehouse actually contains: NULL grain
  * values (groupBy keeps a null group; a join- or filter-based replay
  * that drops nulls would silently lose it), NULL-bearing measure
  * columns (AVG's CountCol denominator), negative sums, single-group
  * and EMPTY sources, and heavy value collisions. (Plain ScalaCheck
  * generators from fixed seeds, as in ScalePropertySpec.)
  */
class SummaryRewritePropertySpec extends SparkSpec {

  // g1 includes a genuine NULL grain value; x is a nullable measure
  // with negatives; tiny domains force collisions and empty-ish groups
  private val rows: Gen[List[(Option[String], Long, Option[Long])]] =
    Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, Gen.zip(
      Gen.oneOf(Some("a"), Some("b"), Some("c"), Option.empty[String]),
      Gen.choose(0L, 2L),
      Gen.frequency(3 -> Gen.choose(-500L, 500L).map(Some(_)),
        1 -> Gen.const(Option.empty[Long])))))

  private def sample(i: Int): List[(Option[String], Long, Option[Long])] =
    if (i == 0) Nil // the empty source is a corner worth forcing
    else rows.pureApply(Gen.Parameters.default, Seed(i.toLong))

  test("rewrite is answer-preserving on arbitrary data: null grains, null measures, negatives, empty") {
    import SummaryRewrite._
    import spark.implicits._
    SummaryRewrite.install(spark)
    (0 to 5).foreach { i =>
      val base = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(Tables.scratchDir), s"graft-mvprop$i-")
      val srcPath = base.resolve("src").toString
      val sumPath = base.resolve("sum").toString
      sample(i).toDF("g1", "g2", "x").repartition(2).write.parquet(srcPath)
      def src = spark.read.parquet(srcPath)
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      src.groupBy("g1", "g2")
        .agg(count(lit(1)).as("n"), count(col("x")).as("cnt_x"),
          sum("x").as("sum_x"), min("x").as("min_x"), max("x").as("max_x"))
        .repartition(1).write.parquet(sumPath)
      val key = graft.ops.Scale.sourcePathOf(src)
      register(key, Summary(SummaryLocation.FixedPath(sumPath), Seq("g1", "g2"),
        Map(CountStar -> "n", CountCol("x") -> "cnt_x", SumCol("x") -> "sum_x",
          MinCol("x") -> "min_x", MaxCol("x") -> "max_x")))
      try {
        val shapes: Seq[(String, () => DataFrame, Boolean)] = Seq(
          ("grain-full", () => src.groupBy("g1", "g2")
            .agg(count(lit(1)).as("m1"), sum("x").as("m2"),
              min("x").as("m3"), max("x").as("m4"), avg("x").as("m5")), true),
          ("subset-g1", () => src.groupBy("g1")
            .agg(count(col("x")).as("m1"), sum("x").as("m2")), true),
          ("global", () => src.agg(count(lit(1)).as("m1"), avg("x").as("m2")), true),
          ("nd-grain", () => src.groupBy("g1")
            .agg(countDistinct(col("g2")).as("m1")), true),
          ("grain-filter-eq", () => src.where(col("g1") === "a")
            .groupBy("g2").agg(sum("x").as("m1")), true),
          ("grain-filter-range", () => src.where(col("g2") > 0)
            .groupBy("g1").agg(count(lit(1)).as("m1"), avg("x").as("m2")), true),
          // non-grain measure must decline but still answer identically
          ("non-qualifying", () => src.groupBy("g1")
            .agg(countDistinct(col("x")).as("m1")), false))
        shapes.foreach { case (label, q, expectRewrite) =>
          spark.conf.set(SummaryRewrite.EnabledKey, "true")
          val planOn = q().queryExecution.executedPlan.toString
          val on = q().collect().map(_.toString).sorted.toSeq
          spark.conf.set(SummaryRewrite.EnabledKey, "false")
          val off = q().collect().map(_.toString).sorted.toSeq
          assert(on === off, s"seed $i / $label: rewrite changed the ANSWER\n" +
            s"on=$on\noff=$off")
          val rewrote = planOn.contains("/sum") && !planOn.contains("/src")
          assert(rewrote === expectRewrite,
            s"seed $i / $label: expected rewrite=$expectRewrite\n" +
              planOn.take(800))
        }
        // the hostile corners this spec exists for must actually OCCUR
        // across the seeded samples (checked on the union, not per seed)
      } finally {
        registry.remove(key): Unit
        spark.conf.set(SummaryRewrite.EnabledKey, "false")
        Tables.deleteRecursively(base.toFile)
      }
    }
    // corpus-of-seeds liveness: nulls in grain AND measure, negatives,
    // and an empty source all occurred
    val all = (0 to 5).flatMap(sample)
    assert(sample(0).isEmpty, "seed 0 must be the empty source")
    assert(all.exists(_._1.isEmpty), "no null grain value in any seed")
    assert(all.exists(_._3.isEmpty), "no null measure value in any seed")
    assert(all.exists(_._3.exists(_ < 0)), "no negative measure in any seed")
  }
}
