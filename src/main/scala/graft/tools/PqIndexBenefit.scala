package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe-vs-recompute measurement for the persisted PQ index (the
  * IndexBenefit/SigIndexBenefit protocol applied to the fourth family):
  * a query batch answered against STORED codes (`pqIndexTopK` — reads m
  * bytes + norm per corpus row, model read back, nothing re-fit) vs the
  * self-contained in-memory form (`pqTopK` — re-fits the codebooks and
  * re-encodes the whole float corpus every call). Both run twice
  * (warm-pair protocol), outputs checked row-identical.
  */
object PqIndexBenefit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings").localCheckpoint()
    val q = e.filter(col("vec_id") < 10).localCheckpoint()
    val idx = java.nio.file.Files.createTempDirectory("graft_pqib").toString
    val t0 = System.nanoTime()
    graft.ext.Similarity.buildPqIndex(e, "vec_id", "embedding", idx)
    println(f"build (one-time): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    def time(tag: String)(f: => Long): Double = (1 to 2).map { i =>
      val t = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t) / 1e9
      println(f"$tag run$i: $sec%.2f s rows=$rows")
      sec
    }.min
    val probeSec = time("index-probe") {
      graft.ext.Similarity.pqIndexTopK(spark, idx, q, "vec_id", "embedding", 5,
        rerank = 50, vectors = Some(e)).count()
    }
    val memSec = time("in-memory") {
      graft.ext.Similarity.pqTopK(e, q, "vec_id", "embedding", 5,
        m = 16, ksub = 64, rerank = 50).count()
    }
    val a = graft.ext.Similarity.pqIndexTopK(spark, idx, q, "vec_id", "embedding", 5,
      rerank = 50, vectors = Some(e))
    val b = graft.ext.Similarity.pqTopK(e, q, "vec_id", "embedding", 5,
      m = 16, ksub = 64, rerank = 50)
    val diff = a.exceptAll(b).unionByName(b.exceptAll(a)).count()
    println(f"probe=$probeSec%.2f s in-memory=$memSec%.2f s " +
      f"speedup=${memSec / probeSec}%.2f row-diff=$diff " +
      (if (diff == 0) "IDENTICAL" else "MISMATCH"))
    spark.stop()
  }
}
