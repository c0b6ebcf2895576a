package graft.operators

import org.apache.spark.sql.DataFrame

/** Hard enforcement for the all-pairs "exact verifier" operators.
  *
  * [[Dedup.jaccardPairs]], [[Similarity.cosineNearDup]],
  * [[Similarity.bruteForceTopK]] and [[Similarity.hardNegatives]] are
  * intentionally quadratic — they exist as exact baselines that the
  * scale-safe siblings ([[Dedup.jaccardPrefixPairs]], [[Dedup.minhashNearDup]],
  * [[Similarity.lshNearDup]], [[Similarity.ivfTopK]]) are verified against.
  * Documentation alone does not stop a caller from pointing one of them at a
  * 100 TB corpus, so each entry point calls [[guard]] first: inputs larger
  * than `spark.graft.allPairs.maxInputRows` (default 100,000 rows) throw
  * with a pointer to the scale-safe sibling instead of launching an O(n²)
  * job that can never finish.
  *
  * The probe is `limit(cap + 1).count()` — a GlobalLimit that early-stops
  * after cap+1 rows, so the guard costs a bounded scan, never a full pass
  * over the input. Set the conf to `-1` to disable (e.g. a deliberate
  * large verification run on a throwaway cluster).
  */
object ScaleFence {

  /** Session conf key for the all-pairs input-row cap; `-1` disables. */
  val MaxInputRowsKey = "spark.graft.allPairs.maxInputRows"

  /** Default cap: 100k rows → ≤5·10⁹ candidate pairs, the upper edge of
    * what a single-site exact verification can justify. Far above every
    * test SF (sf0.1 ships 5k documents / 2k embeddings) and far below any
    * corpus the LSH/prefix-filter paths exist for.
    */
  val DefaultMaxInputRows = 100000L

  /** Throw `IllegalArgumentException` if `df` has more than the configured
    * cap of rows. `op` names the guarded operator, `alternative` the
    * scale-safe sibling(s) named in the error message.
    */
  def guard(df: DataFrame, op: String, alternative: String): Unit = {
    val cap = df.sparkSession.conf
      .get(MaxInputRowsKey, DefaultMaxInputRows.toString).toLong
    if (cap >= 0L) {
      val probeLimit = math.min(cap + 1L, Int.MaxValue.toLong).toInt
      val n = df.limit(probeLimit).count()
      require(n <= cap,
        s"$op is an all-pairs exact verifier fenced at $cap input rows " +
          s"(input has >= $n). For corpus-scale runs use $alternative. " +
          s"Raise or disable the fence via $MaxInputRowsKey (-1 disables) " +
          "only for deliberate exact verification at known cost.")
    }
  }
}
