package graft

/** QUERY-LEVEL parity for the adaptive PrefixSum: every gate query that
  * rides it must produce IDENTICAL results under the forced two-phase plan
  * and the single-window fast path. PrefixSumSpec proves the operator
  * equivalence on synthetic data; this closes the integration gap (caller
  * checkpoints, decimal staging, tie columns, downstream rounding) on the
  * real query shapes — the layer where the sf0.01 oracle gate can't see
  * the two-phase plan because the inputs sit under the threshold.
  */
class AdaptiveParitySpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def withThreshold[A](t: String)(body: => A): A = {
    spark.conf.set("graft.prefixsum.threshold", t)
    try body finally spark.conf.unset("graft.prefixsum.threshold")
  }

  // sorted MULTISET, not Set: a path bug that duplicates or collapses
  // identical rows must fail the parity check, not vanish into set-equality
  private def rows(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect().map(_.toString).toSeq.sorted
  }

  Seq("q_rfm", "q_lorenz_share", "q_gini", "q_skyline", "q_ks_stat",
    "q_mann_whitney", "q_auc_roc", "q_perplexity_filter").foreach { name =>
    test(s"$name: forced two-phase equals the adaptive fast path") {
      val fast = rows(name) // default threshold: small path at sf0.001
      val twoPhase = withThreshold("-1")(rows(name))
      assert(fast == twoPhase,
        s"$name diverged between paths (n=${fast.size} vs ${twoPhase.size}): " +
          s"only-fast=${(fast.toSet -- twoPhase.toSet).take(3)} " +
          s"only-two-phase=${(twoPhase.toSet -- fast.toSet).take(3)}")
    }
  }
}
