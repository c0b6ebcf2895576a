package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * The testdata `events` table carries TIMESTAMP(NANOS) parquet timestamps,
  * which Spark refuses by default (PARQUET_TYPE_ILLEGAL). We read them via
  * `spark.sql.legacy.parquet.nanosAsLong` and expose `ts_us` (epoch
  * microseconds, long) — microsecond grain matches DuckDB's internal timestamp
  * precision, so window ordering and equality agree exactly between the engine
  * and the oracle.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events with `ts` replaced by `ts_us` (epoch micros, long).
    *
    * Adaptive on the generator's physical encoding: TIMESTAMP(NANOS)
    * arrives as ns longs (via the legacy conf) → `div 1000`;
    * TIMESTAMP(MICROS) arrives as a (NTZ) timestamp → `unix_micros`
    * (the NTZ→timestamp cast is identity under the UTC session timezone
    * every entry point pins). Both land on the same epoch-µs longs the
    * DuckDB oracle convention (`epoch_us(ts)`) produces.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    val tsUs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    raw.withColumn("ts_us", tsUs).drop("ts")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
