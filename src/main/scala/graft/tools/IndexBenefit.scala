package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Day-2 measurement for the persisted dedup index: with the index built
  * ONCE (untimed), time a batch dedup via the index probe
  * ([[graft.ext.Dedup.minhashLshPairsAgainstIndex]]) against the direct
  * recompute ([[graft.ext.Dedup.minhashLshPairsIncremental]]) on the same
  * corpus/batch split — the modulo split (batch = doc_id % m == 0) keeps
  * the comparison meaningful on the key-shifted replicas. Warm-pair
  * protocol: each path twice, read the minima. Then times the AUTO
  * dispatcher (`corpusForBulk` passed) and checks it (a) ran at the
  * cheaper side's speed and (b) returned the identical row multiset —
  * the round-12 witness that a bulk batch no longer silently takes the
  * measured-3.9×-slower probe path.
  *
  * Usage: `graft.tools.IndexBenefit <sfDir> [modulus ...]` — each modulus
  * m splits batch = `doc_id % m == 0` (10 → a 10% bulk batch; 1000 → a
  * 0.1% crawl-cadence batch). Default sweep: 1000 10.
  */
object IndexBenefit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val moduli = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1000, 10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
    moduli.foreach { m =>
      println(s"== modulus $m (batch = ${100.0 / m}% of docs) ==")
      val corpus = d.filter(pmod(col("doc_id"), lit(m)) =!= 0)
      val batch = d.filter(pmod(col("doc_id"), lit(m)) === 0)
      val idx = java.nio.file.Files.createTempDirectory("graft_idx_benefit").toString
      val t0 = System.nanoTime()
      graft.ext.Dedup.buildDedupIndex(corpus, "doc_id", "text", idx,
        n = 1, numHashes = 64, bands = 16)
      println(f"build (one-time): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      def time(tag: String)(f: => Long): Double = (1 to 2).map { i =>
        val t = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t) / 1e9
        println(f"$tag run$i: $sec%.2f s rows=$rows")
        sec
      }.min
      val probeSec = time("probe-against-index") {
        graft.ext.Dedup.minhashLshPairsAgainstIndex(spark, idx, batch,
          "doc_id", "text", n = 1, numHashes = 64, bands = 16,
          verifyThreshold = 0.7).count()
      }
      val directSec = time("direct-recompute") {
        graft.ext.Dedup.minhashLshPairsIncremental(corpus, batch,
          "doc_id", "text", n = 1, numHashes = 64, bands = 16,
          verifyThreshold = 0.7).count()
      }
      def auto = graft.ext.Dedup.minhashLshPairsAgainstIndex(spark, idx, batch,
        "doc_id", "text", n = 1, numHashes = 64, bands = 16,
        verifyThreshold = 0.7, corpusForBulk = Some(corpus))
      val autoSec = time("auto-dispatch") { auto.count() }
      val direct = graft.ext.Dedup.minhashLshPairsIncremental(corpus, batch,
        "doc_id", "text", n = 1, numHashes = 64, bands = 16,
        verifyThreshold = 0.7)
      val diff = auto.exceptAll(direct).unionByName(direct.exceptAll(auto)).count()
      val cheaper = math.min(probeSec, directSec)
      println(f"modulus $m: probe=$probeSec%.2f s direct=$directSec%.2f s " +
        f"auto=$autoSec%.2f s (cheaper side $cheaper%.2f s, " +
        f"auto/cheaper=${autoSec / cheaper}%.2f) row-diff=$diff " +
        (if (diff == 0) "IDENTICAL" else "MISMATCH"))
    }
    spark.stop()
  }
}
