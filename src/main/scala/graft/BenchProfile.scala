package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-query job/stage profiler for the optimization rounds (guide §1):
  * runs a named gate query twice (warm + measured) through the noop sink
  * and prints one line per Spark JOB of the measured run — wall seconds,
  * task count, summed executor task time, shuffle bytes — so "where do the
  * N seconds go" is answerable per query without the (disabled) UI.
  * Measurement-only tool: not part of the driver contract or the gate.
  *
  * Usage: runMain graft.BenchProfile <query> [<query> ...]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32).
  */
object BenchProfile {

  private final class JobLog extends SparkListener {
    case class Job(id: Int, var desc: String, var start: Long, var end: Long,
        var tasks: Int, var taskMs: Long, var shufR: Long, var shufW: Long,
        var stages: Int)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    private val stageToJob = mutable.HashMap[Int, Int]()
    var enabled = false

    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      if (!enabled) return
      // fall back to the result stage's callsite so unlabelled jobs are
      // still attributable to an operator line in the profile table
      val site = e.stageInfos.sortBy(-_.stageId).headOption
        .map(_.name).getOrElse("")
      val j = Job(e.jobId, Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty).getOrElse(site), e.time, 0L, 0, 0L, 0L, 0L,
        e.stageIds.size)
      jobs(e.jobId) = j
      e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.end = e.time)
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      for (jid <- stageToJob.get(e.stageId); j <- jobs.get(jid);
           m <- Option(e.taskMetrics)) {
        j.tasks += 1
        j.taskMs += m.executorRunTime
        j.shufR += m.shuffleReadMetrics.totalBytesRead
        j.shufW += m.shuffleWriteMetrics.bytesWritten
      }
    }
    def reset(): Unit = synchronized { jobs.clear(); stageToJob.clear() }
    def report(): String = synchronized {
      val rows = jobs.values.toSeq
      val total = rows.map(j => (j.end - j.start).max(0L)).sum / 1e3
      val hdr = f"  ${"job"}%4s ${"wall_s"}%7s ${"tasks"}%6s ${"taskCpu_s"}%9s ${"shufR_MB"}%9s ${"shufW_MB"}%9s  desc"
      val body = rows.map { j =>
        f"  ${j.id}%4d ${(j.end - j.start).max(0L) / 1e3}%7.3f ${j.tasks}%6d ${j.taskMs / 1e3}%9.2f ${j.shufR / 1e6}%9.1f ${j.shufW / 1e6}%9.1f  ${j.desc.take(80)}"
      }.mkString("\n")
      f"  jobs=${rows.size} sumJobWall=${total}%.2f s\n$hdr\n$body"
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val log = new JobLog
    spark.sparkContext.addSparkListener(log)

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    args.foreach { name =>
      require(SparkEntry.queries.contains(name), s"unknown query: $name")
      val warm = once(name) // JIT/codegen warm pass
      log.reset(); log.enabled = true
      val t = once(name)
      log.enabled = false
      println(f"== $name warm=$warm%.2f s measured=$t%.2f s")
      println(log.report())
    }
    spark.stop()
  }
}
