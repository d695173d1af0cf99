package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Recall, Similarity}

/** Parameter-tuning harness for the approximate-similarity operators: prints
  * measured recall@5 (vs the exact brute-force baseline) for a grid of
  * IVF / LSH / composed LSH+SQ8 settings on a scale-factor directory.
  * Usage: tools/runmain.sh graft.tools.TuneAnn /root/testdata/sf0.01
  */
object TuneAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Session.local(32, appName = "graft-tune")
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
    exact.cache().count()

    def macroRecall(approx: org.apache.spark.sql.DataFrame): Double =
      Recall.macroAvg(Recall.topKRecall(exact, approx))

    for (nlist <- Seq(16, 32); nprobe <- Seq(4, 6, 8))
      println(f"IVF  nlist=$nlist%3d nprobe=$nprobe%2d  recall=${
        macroRecall(Similarity.ivfTopK(e, q, "vec_id", "embedding", 5, nlist, nprobe))}%.3f")
    for (planes <- Seq(4, 5, 6); tables <- Seq(8, 16, 24))
      println(f"LSH  planes=$planes%2d tables=$tables%2d  recall=${
        macroRecall(Similarity.lshTopK(e, q, "vec_id", "embedding", 5, planes, tables))}%.3f")
    for (planes <- Seq(3, 4, 5); tables <- Seq(8, 10, 12, 16))
      println(f"LSH+SQ8 planes=$planes%2d tables=$tables%2d  recall=${
        macroRecall(Similarity.lshSq8TopK(e, q, "vec_id", "embedding", 5, planes, tables))}%.3f")
    spark.stop()
  }
}
