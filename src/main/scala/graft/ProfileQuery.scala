package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev-only per-query profiler (optimization rounds): runs ONE SparkEntry
  * query under the exact Bench session conf and prints a per-job / per-stage
  * cost table (wall, task-time sum, shuffle bytes, peak rows) so the slow
  * part of a multi-job query is identifiable without the Spark UI (disabled
  * in Bench for overhead parity).
  *
  * Usage: sbt "runMain graft.ProfileQuery <queryName> [sfDir] [reps]"
  * Not part of the driver contract; never invoked by Verify/Bench.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ProfileQuery <query> [sfDir] [reps]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("graft.lsh.bitsPerBand", "6")
      .config("graft.semdedup.centroids", "8")
      .config("graft.ivf.centroids", "10")
      .config("spark.sql.codegen.useIdInClassName", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class StageRec(id: Int, name: String, var wallMs: Long = 0,
      var taskMs: Long = 0, var tasks: Int = 0, var shufRead: Long = 0,
      var shufWrite: Long = 0, var input: Long = 0, var rows: Long = 0,
      var gcMs: Long = 0, var cpuMs: Long = 0, var deserMs: Long = 0)
    val stages = scala.collection.concurrent.TrieMap.empty[Int, StageRec]
    val jobs = scala.collection.concurrent.TrieMap.empty[Int, (Long, Long, Seq[Int], String)]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val rec = StageRec(si.stageId, si.name.takeWhile(_ != '\n'))
        rec.wallMs = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1)
        val m = si.taskMetrics
        rec.taskMs = m.executorRunTime
        rec.tasks = si.numTasks
        rec.shufRead = m.shuffleReadMetrics.totalBytesRead
        rec.shufWrite = m.shuffleWriteMetrics.bytesWritten
        rec.input = m.inputMetrics.bytesRead
        rec.rows = m.outputMetrics.recordsWritten
        rec.gcMs = m.jvmGCTime
        rec.cpuMs = m.executorCpuTime / 1000000
        rec.deserMs = m.executorDeserializeTime
        stages(si.stageId) = rec
      }
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs(j.jobId) = (j.time, -1L, j.stageIds.map(_.toInt),
          Option(j.properties).map(_.getProperty("spark.job.description", "")).getOrElse(""))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.get(j.jobId).foreach(t => jobs(j.jobId) = (t._1, j.time, t._3, t._4))
    }

    def once(tag: String): Unit = {
      stages.clear(); jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let async listener-bus events drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"%n=== $tag $name: wall $wall%.3f s, ${jobs.size} jobs, ${stages.size} stages ===")
      jobs.toSeq.sortBy(_._1).foreach { case (jid, (s, e, sids, _)) =>
        val jw = if (e > 0) (e - s) / 1e3 else -1.0
        println(f"job $jid%3d  wall $jw%7.3f s  stages ${sids.sorted.mkString(",")}")
        sids.sorted.flatMap(stages.get).foreach { r =>
          println(f"    stage ${r.id}%4d ${r.wallMs / 1e3}%7.3f s  taskSum ${r.taskMs / 1e3}%8.3f s  cpu ${r.cpuMs / 1e3}%8.3f s  gc ${r.gcMs / 1e3}%6.3f s  deser ${r.deserMs / 1e3}%6.3f s  tasks ${r.tasks}%4d  in ${r.input / 1024}%7d KiB  sR ${r.shufRead / 1024}%7d KiB  ${r.name.take(60)}")
        }
      }
      graft.operators.Dedup.unpersistIntermediates()
      spark.catalog.clearCache()
    }
    (1 to reps).foreach(i => once(s"run$i"))
    spark.stop()
  }
}
