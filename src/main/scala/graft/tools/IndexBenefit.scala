package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Day-2 measurement for the persisted dedup index: with the index built
  * ONCE (untimed), time a batch dedup via the index probe
  * ([[graft.ext.Dedup.minhashLshPairsAgainstIndex]]) against the direct
  * recompute ([[graft.ext.Dedup.minhashLshPairsIncremental]]) on the same
  * corpus/batch split — the modulo split (batch = doc_id % 10 == 0) keeps
  * the comparison meaningful on the key-shifted replicas. Warm-pair
  * protocol: each path twice, read the minima.
  *
  * Usage: `graft.tools.IndexBenefit <sfDir> [batchModulus]` — the batch is
  * `doc_id % batchModulus == 0` (default 10, i.e. a 10% batch; crawl
  * cadence is better modeled by 1000, a 0.1% batch).
  */
object IndexBenefit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val m = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
    val corpus = d.filter(pmod(col("doc_id"), lit(m)) =!= 0)
    val batch = d.filter(pmod(col("doc_id"), lit(m)) === 0)
    val idx = java.nio.file.Files.createTempDirectory("graft_idx_benefit").toString
    val t0 = System.nanoTime()
    graft.ext.Dedup.buildDedupIndex(corpus, "doc_id", "text", idx,
      n = 1, numHashes = 64, bands = 16)
    println(f"build (one-time): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    def time(tag: String)(f: => Long): Unit = (1 to 2).foreach { i =>
      val t = System.nanoTime()
      val rows = f
      println(f"$tag run$i: ${(System.nanoTime() - t) / 1e9}%.2f s rows=$rows")
    }
    time("probe-against-index") {
      graft.ext.Dedup.minhashLshPairsAgainstIndex(spark, idx, batch,
        "doc_id", "text", n = 1, numHashes = 64, bands = 16,
        verifyThreshold = 0.7).count()
    }
    time("direct-recompute") {
      graft.ext.Dedup.minhashLshPairsIncremental(corpus, batch,
        "doc_id", "text", n = 1, numHashes = 64, bands = 16,
        verifyThreshold = 0.7).count()
    }
    spark.stop()
  }
}
