package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy operators for training-data release, complementing the
  * PII-redaction pass ([[TextAnalysis]] / q_pii_redact): k-anonymity
  * suppression over quasi-identifier columns.
  *
  * Scale posture: the group-size computation is a window count partitioned
  * by the quasi-identifier tuple — one shuffle on the quasi-identifier hash,
  * identical cost to a groupBy on the same keys, and the suppression itself
  * is a codegen'd projection. No driver-side state; skewed quasi-identifier
  * groups are large groups, which are exactly the ones NOT suppressed, so
  * skew only shifts work between already-cheap branches.
  */
object Anonymize {

  /** How [[kAnonymize]] pins the single evaluation of its window count
    * (session conf; default `localCheckpoint`):
    *
    *  - `localCheckpoint` — lineage-truncating executor-local materialization.
    *    Cheapest on a stable topology, but the blocks live in executor
    *    storage with NO lineage to rebuild from: on a cluster, losing an
    *    executor (or dynamic-allocation decommission) fails the job
    *    unrecoverably. Fine for local[] / static-allocation clusters.
    *  - `cache` — MEMORY_AND_DISK persist WITH lineage. A lost block is
    *    recomputed from source, so the job survives executor loss. BUT the
    *    pinned blocks are consumed TWICE (once by the starPool guard
    *    aggregate, once by the suppression branch): a block evicted or lost
    *    BETWEEN those two consumptions recomputes from the upstream, and if
    *    that upstream is non-deterministic (sample/rand) the recomputed rows
    *    differ from the ones the _nstar guard was computed over — the guard
    *    then no longer matches the rows it gates, reopening the sub-k "*"
    *    release hazard for exactly that divergence window. `cache` narrows
    *    the hazard (vs `none` re-evaluating everything); it does NOT close
    *    it. Callers with non-deterministic upstreams on dynamic-allocation
    *    clusters should pre-pin with a reliable `df.checkpoint()` (HDFS-
    *    backed, survives executor loss deterministically) before calling.
    *    NOTE `cache` registers the counted plan in the session's shared
    *    CacheManager and [[kAnonymize]] never unpersists it: a LATER
    *    logically-identical call under pin mode `none` silently resolves to
    *    the cached InMemoryRelation — `none` is not honored after a prior
    *    `cache` call in the same session unless the caller releases first
    *    (`spark.catalog.clearCache()` / unpersist on the source).
    *  - `none` — no pin: each consumer re-evaluates the scan + window.
    *    ONLY sound when the caller certifies the input deterministic
    *    (no sample/rand/shuffling nondeterminism upstream); avoids pinned
    *    blocks entirely at the cost of a second scan + window.
    *
    * Pinned blocks (both modes) live until unpersisted or session end;
    * long-running sessions that call kAnonymize repeatedly should prefer
    * `cache` and release between calls (`spark.catalog.clearCache()` or
    * unpersist on the source).
    */
  val PinModeKey = "graft.anonymize.pin"

  /** Suppress quasi-identifiers of rows whose quasi-identifier group has
    * fewer than k members: each column in `quasiCols` is replaced by "*"
    * (stringified otherwise), so every released row is identical to at
    * least k-1 others on the quasi columns — the classic k-anonymity
    * contract (Sweeney 2002). Non-quasi columns pass through unchanged.
    *
    * The suppressed rows form their own quasi-identifier class (all "*"),
    * so the contract must hold for THAT class too: when fewer than k rows
    * get suppressed in total, releasing them would make the "*" group
    * itself k-violating (a lone "*" row is unique — trivially linkable).
    * Such rows are DROPPED instead (round-13 fix; standard suppression
    * semantics). The pool size arrives as a broadcast one-row aggregate,
    * not a global window — no single-partition stage at any scale.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    Seq("_qn", "_nstar").foreach { n =>
      require(!df.columns.contains(n),
        s"kAnonymize: input may not contain reserved working column '$n'")
    }
    val w = Window.partitionBy(quasiCols.map(col): _*)
    // Pin ONE evaluation of the window count: starPool and guarded both
    // consume withN, and without the pin each branch re-evaluates the full
    // scan + window — so a non-deterministic upstream (sample/rand) could
    // compute the _nstar guard from different rows than the ones it gates,
    // releasing a sub-k "*" class. The lazy pin also halves the scan cost
    // (the double-window was q_kanonymity's 1.64x anchor ratio). Pin
    // mechanism is conf-selectable — see [[PinModeKey]] for the cluster
    // (dynamic-allocation) caveat on the localCheckpoint default.
    val counted = df.withColumn("_qn", count(lit(1)).over(w))
    val withN = df.sparkSession.conf.get(PinModeKey, "localCheckpoint") match {
      case "localCheckpoint" => counted.localCheckpoint(false)
      case "cache"           => counted.cache()
      case "none"            => counted
      case other => throw new IllegalArgumentException(
        s"$PinModeKey must be localCheckpoint|cache|none, got '$other'")
    }
    val starPool = withN.filter(col("_qn") < k)
      .agg(count(lit(1)).as("_nstar"))
    val guarded = withN
      .crossJoin(broadcast(starPool)) // 1-row scalar: broadcast NL, no shuffle
      .filter(col("_qn") >= k || col("_nstar") >= k)
    val suppressed = quasiCols.foldLeft(guarded) { (d, c) =>
      d.withColumn(c,
        when(col("_qn") < k, lit("*")).otherwise(col(c).cast("string")))
    }
    suppressed.drop("_qn", "_nstar")
  }
}
