package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Fleet-wide plan lint: EVERY registered query must plan without a
  * cartesian product or nested-loop join — the two shapes that turn a
  * 100 TB run into |L|x|R| work. Per-query specs pin the interesting
  * plans individually; this audit guarantees no future query slips a
  * quadratic join into the registry unnoticed.
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries allowed to skip the audit: the stateful replays execute a
    * real stream on invocation (their plans are audited by their own
    * specs and their cost bounded by their oracles), and the two exact
    * all-pairs baselines are size-gated, bench-excluded correctness
    * oracles whose pairwise shape is their documented purpose.
    */
  private val skip: Set[String] = Set(
    "q71_stateful_totals", "q89_stateful_totals_tws")

  /** q45 brute kNN and q213 semantic decontamination are |Q|x|corpus|
    * BY DEFINITION (exact scores against a handful of broadcast
    * query/benchmark vectors over every row) — the
    * BroadcastNestedLoopJoin over the tiny broadcast side IS the right
    * plan. The four registered ANN AUDIT forms (q46/q54/q58/q94)
    * embed the same sanctioned shape: their approximate core is pinned
    * BNLJ-free by SimSpec's plan test, and the audit stage grades it
    * against knnBrute / a bounded anchored broadcast probe (≤ 1000
    * anchors by construction — linear, not quadratic, in the corpus).
    */
  private val allowPairwise: Set[String] =
    SparkEntry.exactBaselines + "q45_knn_brute" + "q213_semantic_decontam" +
      "q46_knn_lsh" + "q54_knn_ivf" + "q58_embedding_pairs_lsh" +
      "q94_semdedup"

  test("no registered query plans a cartesian or nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => skip(n) || allowPairwise(n) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(plan.contains)
        if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(", ")}")
      }
    assert(offenders.isEmpty, s"quadratic join shapes in:\n${offenders.mkString("\n")}")
  }

  /** The q65/q111 rule, mechanized: the driver's correctness harness
    * sorts result rows in pandas, and an array/map/struct output column
    * throws `unhashable type: numpy.ndarray` — a harness crash, not a
    * mismatch. Every registered query must ship a FLAT final schema
    * (join arrays into strings before returning).
    */
  test("no registered query's final schema contains an array/map/struct column") {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => skip(n) }
      .flatMap { case (name, fn) =>
        val bad = fn(spark, sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.simpleString}"
        }
        if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(", ")}")
      }
    assert(offenders.isEmpty, s"non-flat output columns in:\n${offenders.mkString("\n")}")
  }
}
