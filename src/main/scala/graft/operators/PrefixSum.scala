package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase global prefix sums — the rank-statistics version of the
  * surrogate-key offset pattern ([[Joins]]' range-partitioned two-phase
  * ids): a cumulative sum over a GLOBAL ordering without ever running a
  * single-partition window over the data.
  *
  * The single-partition hazard: `Window.orderBy(value)` with no
  * PARTITION BY collapses the whole input onto one task. The rank-stat
  * queries (Mann-Whitney, AUC-ROC, KS) apply it to the distinct-value
  * HISTOGRAM, which is bounded for discrete domains — but for a continuous
  * score column |histogram| ≈ |corpus| and that one task becomes the
  * bottleneck (the round-8 verdict's watch item).
  *
  * Two phases instead:
  *   1. bucket rows by `orderCol` into `numParts` ORDERED buckets using
  *      `percentile_approx` bounds — a deterministic function of the data
  *      (unlike `repartitionByRange`, whose sampled boundaries could
  *      differ between the plan branches that both need the bucket id);
  *      per-bucket exclusive running sums via a PARTITIONED window;
  *   2. per-bucket totals (≤ numParts rows) prefix-summed with a global
  *      window — single-partition, but over a row count bounded by CLUSTER
  *      CONFIG, not data — and broadcast back as per-bucket offsets.
  *
  * `exclusive(df, c, cols)` appends `<col>_excl` = Σ of `col` over all rows
  * strictly before the current row in `orderCol` order. Exact integer
  * algebra: sums are never reordered across types, so LONG stays LONG and
  * downstream hashes match the naive-window formulation bit-for-bit.
  *
  * REQUIREMENT: `orderCol` values must be unique per row (the histogram
  * shape every caller has) — with duplicate keys a row-frame "exclusive"
  * window is ambiguous in both formulations.
  */
object PrefixSum {

  /** Append `<c>_excl` exclusive-prefix-sum columns for each of `sumCols`,
    * ordered globally by `orderCol`. `numParts` defaults to the session's
    * shuffle partitions.
    */
  def exclusive(df: DataFrame, orderCol: String, sumCols: Seq[String],
      numParts: Int = 0): DataFrame = {
    val parts =
      if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ord = col(orderCol).cast("double")
    // Deterministic ordered bucket id: number of approx-percentile bounds
    // strictly below this row's value. Equal values always share a bucket;
    // bucket id is monotone in orderCol, so bucket-local prefix + preceding-
    // bucket totals compose to the global prefix.
    val probs = (1 until parts).map(_.toDouble / parts)
    val withPid =
      if (parts <= 1) df.withColumn("_pid", lit(0))
      else {
        val bounds = df.agg(percentile_approx(
          ord, array(probs.map(lit): _*), lit(10000)).as("_bounds"))
        df.crossJoin(broadcast(bounds))
          .withColumn("_pid",
            size(filter(col("_bounds"), (b: Column) => b < ord)))
          .drop("_bounds")
      }
    val wIn = Window.partitionBy(col("_pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = sumCols.foldLeft(withPid) { (d, c) =>
      d.withColumn(s"_local_$c", coalesce(sum(col(c)).over(wIn), lit(0L)))
    }
    // Phase 2: ≤ numParts rows — the only global window, bounded by config.
    val totals = withPid.groupBy(col("_pid"))
      .agg(sumCols.head -> "sum", sumCols.tail.map(_ -> "sum"): _*)
      .toDF("_pid" +: sumCols.map(c => s"_tot_$c"): _*)
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(
      col("_pid") +: sumCols.map(c =>
        coalesce(sum(col(s"_tot_$c")).over(wOff), lit(0L)).as(s"_off_$c")): _*)
    val joined = local.join(broadcast(offsets), Seq("_pid"), "left")
    val withExcl = sumCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_excl",
        col(s"_local_$c") + coalesce(col(s"_off_$c"), lit(0L)))
    }
    withExcl.drop("_pid")
      .drop(sumCols.map(c => s"_local_$c"): _*)
      .drop(sumCols.map(c => s"_off_$c"): _*)
  }
}
