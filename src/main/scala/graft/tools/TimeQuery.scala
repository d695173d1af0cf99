package graft.tools

/** Time one catalog query repeatedly (noop sink, warm JVM by rep 2+) —
  * the per-query iteration loop Bench is too coarse for.
  * Usage: tools/runmain.sh graft.tools.TimeQuery <name> <sfDir> [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.Session.local(32, appName = "graft-timeq")
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
