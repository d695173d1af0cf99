package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Decompose the fixed per-task cost of the lifecycle-style tiny stages:
  * checkpoint scan -> repartition -> noop, at catalog sizes, repeated so
  * JIT effects show. Prints per-stage task-time totals per rep.
  */
object MicroProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.local(32, appName = "graft-microprof")
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val tm = e.stageInfo.taskMetrics
        if (tm != null)
          stages.add((e.stageInfo.name.take(40), tm.executorRunTime,
            e.stageInfo.numTasks))
      }
    })
    import spark.implicits._
    val base = (1L to 5000L).map(i => (i, i % 64)).toDF("id", "v")
      .repartition(32).localCheckpoint()
    (1 to 5).foreach { r =>
      stages.clear()
      val t0 = System.nanoTime()
      base.repartition(32, col("v"))
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e6
      import scala.jdk.CollectionConverters._
      val det = stages.asScala.map { case (n, ms, t) => s"$n=$ms ms/$t t" }
        .mkString("; ")
      println(f"rep$r wall=$wall%.0f ms   $det")
    }
    // same but writing 64 hive dirs (the comps write shape)
    (1 to 5).foreach { r =>
      stages.clear()
      val t0 = System.nanoTime()
      val dir = java.nio.file.Files.createTempDirectory("mp").toString + "/t"
      base.withColumn("ib", pmod(col("id"), lit(64)))
        .repartition(32, col("ib"))
        .write.mode("overwrite").partitionBy("ib").parquet(dir)
      val wall = (System.nanoTime() - t0) / 1e6
      import scala.jdk.CollectionConverters._
      val det = stages.asScala.map { case (n, ms, t) => s"$n=$ms ms/$t t" }
        .mkString("; ")
      println(f"write rep$r wall=$wall%.0f ms   $det")
    }
    spark.stop()
  }
}
