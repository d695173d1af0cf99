package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Recall, Similarity}

/** Measurement harness for the IVF-PQ auto-knob rule (the autoRerank
  * method applied to the PRUNE side): grid (nlist, nprobe-fraction) with
  * the refine depth already scaled by [[Similarity.autoRerank]], at each
  * given scale dir, and print macro/min recall@5 vs the exact baseline
  * plus the probe fraction (the cost driver). The output feeds the
  * `ivfPqTopKAuto` rule and its BASELINE scaling table.
  *
  * Usage: `graft.tools.IvfPqAutoProbe [dir ...]` — defaults to the three
  * decades sf0.1 / /tmp/sf1 / /tmp/graft_sf10.
  */
object IvfPqAutoProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1", "/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val e = graft.sources.Tables.load(spark, dir, "embeddings").localCheckpoint()
      val q = e.filter(col("vec_id") < 10)
      val n = e.count()
      val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      exact.cache().count()
      val rr = Similarity.autoRerank(n, 5)
      println(s"== $dir n=$n autoRerank=$rr ==")
      if (args.contains("auto")) {
        val t = System.nanoTime()
        val approx = Similarity.ivfPqTopKAuto(e, q, "vec_id", "embedding", 5)
        val r = Recall.topKRecall(exact, approx)
          .agg(avg(col("recall")), min(col("recall"))).head()
        println(f"n=$n AUTO recall avg=${r.getDouble(0)}%.3f " +
          f"min=${r.getDouble(1)}%.3f ${(System.nanoTime() - t) / 1e9}%.1f s")
      } else
      for (nlist <- Seq(16, 32, 64, 128);
           frac <- Seq(0.25, 0.375, 0.5, 0.75)) {
        val nprobe = math.max(1, math.round(nlist * frac).toInt)
        val t = System.nanoTime()
        val approx = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", 5,
          nlist = nlist, nprobe = nprobe, m = 16, ksub = 64, rerank = rr)
        val r = Recall.topKRecall(exact, approx)
          .agg(avg(col("recall")), min(col("recall"))).head()
        val sec = (System.nanoTime() - t) / 1e9
        println(f"n=$n nlist=$nlist%3d nprobe=$nprobe%3d frac=$frac%.3f " +
          f"recall avg=${r.getDouble(0)}%.3f min=${r.getDouble(1)}%.3f $sec%.1f s")
      }
      exact.unpersist(); e.unpersist()
    }
    spark.stop()
  }
}
