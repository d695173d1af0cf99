package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off recall probe for the PQ family (used to pin the q230/q232
  * witness floors; not part of the catalog surface).
  */
object PqProbe {
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
      val e = graft.sources.Tables.load(spark, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      val exact = graft.ext.Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      for ((m, ksub) <- Seq((8, 16), (8, 64), (16, 16), (16, 64), (16, 256));
           rr <- Seq(0, 20, 50, 200, 500)) {
        val pq = graft.ext.Similarity.pqTopK(e, q, "vec_id", "embedding", 5,
          m = m, ksub = ksub, rerank = rr)
        val r1 = graft.ext.Recall.topKRecall(exact, pq)
          .agg(avg(col("recall")), min(col("recall"))).head()
        val ivfpq = graft.ext.Similarity.ivfPqTopK(e, q, "vec_id", "embedding", 5,
          nlist = 16, nprobe = 8, m = m, ksub = ksub, rerank = rr)
        val r2 = graft.ext.Recall.topKRecall(exact, ivfpq)
          .agg(avg(col("recall")), min(col("recall"))).head()
        println(f"$dir m=$m ksub=$ksub rr=$rr pq avg=${r1.getDouble(0)}%.2f " +
          f"min=${r1.getDouble(1)}%.2f ivfpq avg=${r2.getDouble(0)}%.2f min=${r2.getDouble(1)}%.2f")
      }
    }
    spark.stop()
  }
}
