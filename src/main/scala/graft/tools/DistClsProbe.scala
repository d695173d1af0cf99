package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off recall probe for the q244 distributed-classifier fixture
  * (pins the witness floors; not part of the catalog surface).
  * Usage: DistClsProbe [dir ...] [iters=N] [reps=N] [cap=N]
  */
object DistClsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val opts = args.filter(_.contains("=")).map { a =>
      val Array(k, v) = a.split("="); (k, v.toInt) }.toMap
    val iters = opts.getOrElse("iters", 500)
    val reps = opts.getOrElse("reps", 32)
    val cap = opts.getOrElse("cap", 64)
    val dirs = args.filterNot(_.contains("=")).toSeq match {
      case Nil => Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
      case ds => ds
    }
    for (dir <- dirs) {
      val d = graft.sources.Tables.load(spark, dir, "documents")
      val tk = graft.ext.TextAnalysis.tokens(lower(col("text")))
      val labeled = if (opts.contains("winscan"))
        d.select(col("doc_id"), col("text"),
          (size(filter(tk, t => t === "window")) >
            size(filter(tk, t => t === "scan"))).as("label"))
      else d
        .select(col("doc_id"),
          concat(col("text"),
            when(pmod(col("doc_id"), lit(75)) === 0,
              repeat(concat(lit(" marker"),
                pmod(expr("doc_id DIV 75"), lit(3)).cast("string")), reps))
              .otherwise(lit(""))).as("text"),
          (pmod(col("doc_id"), lit(75)) === 0).as("label"))
      val train = labeled.filter(pmod(col("doc_id"), lit(2)) === 0)
      val hold = labeled.filter(pmod(col("doc_id"), lit(2)) === 1)
      def posRecall(m: graft.ext.Classifier.LogRegModel): Double =
        graft.ext.Classifier.score(hold, "doc_id", "text", m)
          .join(hold.select(col("doc_id"), col("label")), "doc_id")
          .filter(col("label"))
          .agg(avg(when(col("predicted"), 1.0).otherwise(0.0)))
          .head().getDouble(0)
      def acc(m: graft.ext.Classifier.LogRegModel): Double =
        graft.ext.Classifier.score(hold, "doc_id", "text", m)
          .join(hold.select(col("doc_id"), col("label")), "doc_id")
          .agg(avg(when(col("predicted") === col("label"), 1.0).otherwise(0.0)))
          .head().getDouble(0)
      val drv = posRecall(graft.ext.Classifier.fit(train, "doc_id", "text",
        "label", sampleN = cap, iters = iters))
      val dm = graft.ext.Classifier.fit(train, "doc_id", "text",
        "label", sampleN = Int.MaxValue, iters = iters, driverSampleCap = cap)
      val dst = posRecall(dm)
      println(f"$dir iters=$iters reps=$reps cap=$cap driverRecall=$drv%.3f " +
        f"distRecall=$dst%.3f distAcc=${acc(dm)}%.3f")
      if (opts.contains("debug")) {
        graft.ext.Classifier.score(hold.filter(col("label")), "doc_id", "text", dm)
          .join(hold.select(col("doc_id"), col("label"),
            length(col("text")).as("len")), "doc_id")
          .show(20, false)
        graft.ext.Classifier.score(
          train.filter(col("label")), "doc_id", "text", dm).show(20, false)
      }
    }
    spark.stop()
  }
}
