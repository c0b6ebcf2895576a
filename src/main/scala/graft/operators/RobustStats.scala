package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust / outlier-aware statistics over grouped numeric columns:
  * percentile winsorization and median-absolute-deviation outlier flagging —
  * the cleanup passes a feature pipeline runs before feeding aggregates to a
  * model.
  *
  * Scale posture: both operators are two-phase — an exact-percentile
  * aggregate per group (one shuffle; the percentile buffer is a single
  * sort-based aggregation per group, same machinery as q_percentile) whose
  * output is ONE ROW PER GROUP, broadcast back onto the fact rows for the
  * clip/flag projection. The rejoin is a broadcast hash join at any corpus
  * scale because the group dimension (returnflags, event types) is tiny; if
  * groups were high-cardinality the same plan degrades gracefully to a
  * shuffled join on the group key. For 100 TB inputs swap `percentile` for
  * `approx_percentile` — the operator shape is unchanged.
  */
object RobustStats {

  /** Backtick-quote a column name spliced into `expr()` SQL (round-13 fix:
    * names with spaces/hyphens threw ParseException and dotted names
    * silently resolved as struct access, unlike the col()-based group
    * handling right next to them). */
  private def quoted(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** Winsorized mean per group: clip `valueCol` to the group's [pLo, pHi]
    * exact percentiles, then average. Returns one row per group:
    * (groupCol, n, avg_raw, avg_winsorized), averages rounded to 6 dp.
    */
  def winsorizedMean(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    val bounds = df.groupBy(groupCol)
      .agg(expr(s"percentile(${quoted(valueCol)}, array(${pLo}D, ${pHi}D))")
        .as("ps"))
      .select(col(groupCol),
        element_at(col("ps"), 1).as("_lo"), element_at(col("ps"), 2).as("_hi"))
    df.join(broadcast(bounds), Seq(groupCol))
      // NULL values must STAY null (round-13 fix): greatest/least skip
      // nulls, so a null row silently clipped to _lo and polluted
      // avg_winsorized with a fabricated value while avg_raw ignored it
      .withColumn("_clipped", when(col(valueCol).isNull, lit(null))
        .otherwise(least(greatest(col(valueCol), col("_lo")), col("_hi"))))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        round(avg(valueCol), 6).as("avg_raw"),
        round(avg(col("_clipped")), 6).as("avg_winsorized"))
  }

  /** Median-absolute-deviation outlier counts per group: med = median(v),
    * mad = median(|v - med|), outlier iff |v - med| > cutoff * mad. Returns
    * (groupCol, n, med, mad, n_outliers), med/mad rounded to 6 dp. Two
    * percentile phases (median of values, then median of deviations), each
    * a broadcast-rejoin as described above.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      cutoff: Double): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(expr(s"percentile(${quoted(valueCol)}, 0.5D)").as("_med"))
    val withDev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("_dev", abs(col(valueCol) - col("_med")))
    val mad = withDev.groupBy(groupCol)
      .agg(expr("percentile(_dev, 0.5D)").as("_mad"))
    withDev.join(broadcast(mad), Seq(groupCol))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        round(first(col("_med")), 6).as("med"),
        round(first(col("_mad")), 6).as("mad"),
        sum(when(col("_dev") > lit(cutoff) * col("_mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }
}
