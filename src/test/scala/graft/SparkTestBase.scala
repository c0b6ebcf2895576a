package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession per suite. */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // gate pins (round 13, same as Verify/Bench): specs assert the
      // oracle-replayed ANN/LSH shapes; DerivedKnobSpec opts back into
      // the corpus-derived default with an empty-string conf override
      .config("graft.lsh.bitsPerBand", "6")
      .config("graft.semdedup.centroids", "8")
      .config("graft.ivf.centroids", "10")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
