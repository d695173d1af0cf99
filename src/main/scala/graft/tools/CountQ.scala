package graft.tools

/** Count the rows of a catalog query (noop-free, one count job) plus an
  * optional top-group histogram of a named column — quick shape probe
  * for pair graphs. Usage: CountQ <sfDir> <name> [groupCol]
  */
object CountQ {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val spark = graft.Session.local(32, appName = "graft-countq")
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(s"$name rows=${df.count()}")
    args.lift(2).foreach { c =>
      df.groupBy(c).count().orderBy(org.apache.spark.sql.functions.desc("count"))
        .show(10, false)
    }
    spark.stop()
  }
}
