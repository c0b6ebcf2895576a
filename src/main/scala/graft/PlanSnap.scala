package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only plan snapshotter for the optimization rounds: dumps
  * `explain("formatted")` of the named queries into
  * `plans/<tag>/<query>_<suffix>.txt` — the before/after evidence files the
  * round deliverables require. Same session shape as [[Plans]] (AQE off so
  * the static plan is readable; production keeps AQE on).
  *
  * Usage: sbt "runMain graft.PlanSnap <tag> <suffix> <query> [query...]"
  * e.g.   sbt "runMain graft.PlanSnap r21 before q_jaccard_prefix"
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <tag> <suffix> <query...>")
    val (tag, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // document the scale shape, not the tiny-SF fast paths (same pin as Plans)
    spark.conf.set("graft.prefixsum.threshold", "-1")
    Files.createDirectories(Paths.get(s"plans/$tag"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/$tag/${name}_$suffix.txt"), plan)
      println(s"[plansnap] wrote plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
