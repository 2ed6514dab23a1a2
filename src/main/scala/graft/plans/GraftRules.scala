package graft.plans

/** The opt-in graft optimizer rules' boolean conf keys, in ONE list:
  * rules are session-global and some queries legitimately leave them
  * enabled (q240's conf must be on at action time), so any test pinning
  * one rule's plan shape must hold every OTHER rule off — via
  * `SparkSpec.withOnlyGraftRule`, not by hand-enumerating keys that a
  * future rule would silently be missing from.
  * ([[BucketedRangeJoin]] activates per `WidthKey` on range-join shapes
  * only — orthogonal to aggregate/scan pins, so not listed.)
  */
object GraftRules {
  val BooleanKeys: Seq[String] =
    Seq(WidenNarrowScans.EnabledKey, SummaryRewrite.EnabledKey)
}
