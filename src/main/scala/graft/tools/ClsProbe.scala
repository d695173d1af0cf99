package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off learnability probe for the hashed-BoW classifier (pins the
  * q235 witness floor; not part of the catalog surface).
  */
object ClsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (dir <- dirs) {
      val d = graft.sources.Tables.load(spark, dir, "documents")
      val tk = graft.ext.TextAnalysis.tokens(lower(col("text")))
      val lbl = (size(filter(tk, t => t === "window")) >
        size(filter(tk, t => t === "scan"))).as("label")
      val labeled = d.select(col("doc_id"), col("text"), lbl)
      val train = labeled.filter(pmod(col("doc_id"), lit(2)) === 0)
      val hold = labeled.filter(pmod(col("doc_id"), lit(2)) === 1)
      val t0 = System.nanoTime()
      val model = graft.ext.Classifier.fit(train, "doc_id", "text", "label")
      val fitSec = (System.nanoTime() - t0) / 1e9
      val scored = graft.ext.Classifier.score(hold, "doc_id", "text", model)
        .join(hold.select(col("doc_id"), col("label")), "doc_id")
      val acc = scored.agg(
        avg(when(col("predicted") === col("label"), 1.0).otherwise(0.0))).head().getDouble(0)
      println(f"$dir acc=$acc%.4f fit=${fitSec}%.1f s")
    }
    spark.stop()
  }
}
