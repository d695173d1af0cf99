package graft.tools

/** Dump `explain("formatted")` for selected catalog queries to files — the
  * before/after plan artifacts an optimization round commits so plan-shape
  * claims (Exchange count, join strategy, PushedFilters) are checkable
  * without running Spark.
  *
  * Usage: tools/runmain.sh graft.tools.PlanDump <sfDir> <outDir> <suffix> [name ...]
  * Writes `<outDir>/<name>_<suffix>.txt` per query (suffix = before|after).
  * With no names, dumps every catalog query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = graft.Session.local(32, appName = "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val txt =
        try {
          val df = graft.SparkEntry.queries(name)(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"FAILED to plan $name: $e" }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"dumped $name")
    }
    spark.stop()
  }
}
