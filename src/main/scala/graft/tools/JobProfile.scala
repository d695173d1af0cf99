package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-JOB wall/task-time attribution for one catalog query — the
  * lifecycle entries (index build + ingest + probe) run dozens of
  * driver-sequential jobs, and TimeQ's one number cannot say which of
  * them the time went to. Prints, per job: wall ms, summed task time,
  * task count, and the callsite, after a warm run (rep 2) so JIT noise
  * does not drown the attribution.
  * Usage: tools/runmain.sh graft.tools.JobProfile <sfDir> <name> [reps]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2 && !args(2).contains("=")) args(2).toInt else 2
    val spark = graft.Session.local(32, appName = "graft-jobprofile")
    spark.sparkContext.setLogLevel("ERROR")
    // trailing k=v args become session confs (A/B a conf-gated path)
    args.drop(2).filter(_.contains("=")).foreach { a =>
      val Array(k, v) = a.split("=", 2)
      spark.conf.set(k, v)
    }
    case class J(id: Int, var start: Long = 0L, var end: Long = 0L,
      var site: String = "", var taskMs: Long = 0L, var tasks: Int = 0) {
      val stages = new scala.collection.mutable.ArrayBuffer[String]()
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (record) {
        val j = J(e.jobId, e.time)
        j.site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        jobs.put(e.jobId, j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        // attribute stage task time to every job that owns the stage; the
        // jobs map is small and stage->job is resolved lazily via jobIds
        // not exposed here, so approximate: add to the most recent open job
        val open = jobs.values().toArray(Array.empty[Object]).collect {
          case j: J @unchecked if j.end == 0L => j
        }
        if (open.nonEmpty) {
          val j = open.maxBy(_.id)
          val ti = e.stageInfo.taskMetrics
          if (ti != null) j.taskMs += ti.executorRunTime
          j.tasks += e.stageInfo.numTasks
          val det = e.stageInfo.details
          val frame = det.split('\n').find(l => l.contains("graft.") &&
            !l.contains("JobProfile")).getOrElse("").trim.take(60)
          val ops = e.stageInfo.rddInfos.flatMap(_.scope)
            .map(_.name).distinct.mkString("+")
          val cs = e.stageInfo.rddInfos.map(_.callSite)
            .find(_.contains("graft")).getOrElse("")
          j.stages += s"[$ops] $cs $frame"
        }
      }
    })
    (1 to reps).foreach { r =>
      jobs.clear()
      record = r == reps
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"$name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import scala.jdk.CollectionConverters._
    val all = jobs.values().asScala.toSeq.sortBy(_.id)
    println(f"${"job"}%4s ${"wall_ms"}%8s ${"task_ms"}%8s ${"tasks"}%6s  site")
    all.foreach { j =>
      println(f"${j.id}%4d ${j.end - j.start}%8d ${j.taskMs}%8d ${j.tasks}%6d  ${j.site} | ${j.stages.mkString("; ")}")
    }
    println(f"jobs=${all.size} wallSum=${all.map(j => j.end - j.start).sum} ms " +
      f"taskSum=${all.map(_.taskMs).sum} ms")
    spark.stop()
  }
}
