package graft.tools

/** Time selected catalog queries with the noop sink (warm JVM by rep 2+) —
  * the per-query iteration loop Bench is too coarse for. Subsumes the old
  * TimeQuery single-query tool.
  * Usage: tools/runmain.sh graft.tools.TimeQ <sfDir> <name> [name ...]
  * Reps per query via SPARK_GRAFT_TIMEQ_REPS (default 3).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val reps = sys.env.get("SPARK_GRAFT_TIMEQ_REPS").map(_.toInt).getOrElse(3)
    val spark = graft.Session.local(32, appName = "graft-timeq")
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
