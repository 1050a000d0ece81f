package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.queries.QueryCatalog

/** Intra-query breakdown for the optimization rounds (guide §1: measure
  * first): runs one query warm, then once timed with a listener that
  * records every job (wall time, description) and every stage (duration,
  * task count, shuffle read/write bytes). The output tells you whether a
  * slow query is one heavy stage, many tiny jobs (fixed per-action
  * overhead — localCheckpoints, iterative loops), or shuffle-bound.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.JobProfile [query...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("training_pipeline")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, var t0: Long = 0L, var t1: Long = 0L,
                   var desc: String = "")
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val stages = mutable.LinkedHashMap[Int, String]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = Job(e.jobId, t0 = e.time)
        j.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.synchronized { jobs(e.jobId) = j }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val line = f"    stage ${si.stageId}%4d ${si.name.take(70)}%-70s " +
          f"tasks=${si.numTasks}%4d " +
          f"dur=${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3}%7.3fs " +
          f"shRead=${m.shuffleReadMetrics.totalBytesRead / 1024}%8dKB " +
          f"shWrite=${m.shuffleWriteMetrics.bytesWritten / 1024}%8dKB " +
          f"in=${m.inputMetrics.bytesRead / 1024}%8dKB"
        stages.synchronized { stages(si.stageId) = line }
      }
    }

    names.foreach { n =>
      val q = QueryCatalog.byName(n)
      q.fn(spark, sfDir).count() // warm
      q.fn(spark, sfDir).count() // warm 2
      jobs.clear(); stages.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"\n===== $n wall=$wall%.3fs jobs=${jobs.size} =====")
      val totalJob = jobs.values.map(j => j.t1 - j.t0).sum / 1e3
      println(f"  sum(job wall)=$totalJob%.3fs (gaps = driver-side work)")
      jobs.values.foreach { j =>
        println(f"  job ${j.id}%4d dur=${(j.t1 - j.t0) / 1e3}%7.3fs ${j.desc.take(80)}")
      }
      println("  --- stages ---")
      stages.values.foreach(println)
    }
    spark.stop()
  }
}
