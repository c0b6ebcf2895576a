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

  /** Suppress quasi-identifiers of rows whose quasi-identifier group has
    * fewer than k members: each column in `quasiCols` is replaced by "*"
    * (stringified otherwise), so every released row is identical to at
    * least k-1 others on the quasi columns — the classic k-anonymity
    * contract (Sweeney 2002). Non-quasi columns pass through unchanged.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    val w = Window.partitionBy(quasiCols.map(col): _*)
    val withN = df.withColumn("_qn", count(lit(1)).over(w))
    val suppressed = quasiCols.foldLeft(withN) { (d, c) =>
      d.withColumn(c,
        when(col("_qn") < k, lit("*")).otherwise(col(c).cast("string")))
    }
    suppressed.drop("_qn")
  }
}
