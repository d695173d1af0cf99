package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crossover measurement for the signature index's BLOCKING LAYOUT
  * ([[graft.ext.Dedup.buildSignatureIndex]]'s narrow-vs-wide dispatch,
  * `SIG_WIDE_BLOCKING_AT`): at which stored-signature count does the
  * wide 2×32-bit ball-probe layout start beating the narrow 4×16-bit
  * radius-0 layout? The narrow candidate stream grows as 4·n·B/2¹⁶ —
  * round 13 measured it degenerating to O(n) per batch above ~8 M
  * stored signatures (a batch's keys saturate the 16-bit space) — while
  * the wide stream is 66·n·B/2³², constant-negligible through the
  * billions, at a fixed 16.5× probe-side key-row cost.
  *
  * Same synthetic corpus as [[SigCcCrossover]] (re-encode-pair classes
  * plus a 1-in-16 one-bit near-dup tail). Per n: build BOTH layouts
  * untimed on all-but-batch, then warm-pair-time the probe at crawl
  * (0.1%) and bulk (2%) cadence. Probe outputs are asserted identical
  * across layouts (and vs the in-memory recompute) at the smallest n.
  *
  * Usage: `graft.tools.SigBlockingCrossover [n ...]` — default sweep
  * 2M 8M 32M.
  */
object SigBlockingCrossover {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(2000000L, 8000000L, 32000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def synthetic(n: Long): DataFrame =
      spark.range(n).select(col("id"), expr(
        """CASE WHEN id % 16 = 3
          |  THEN xxhash64(id DIV 2) ^ shiftleft(CAST(1 AS BIGINT),
          |         CAST(pmod(xxhash64(id), 64) AS INT))
          |  ELSE xxhash64(id DIV 2) END""".stripMargin).as("sig"))

    sizes.foreach { n =>
      val sig = synthetic(n).localCheckpoint()
      // crawl = 0.1% (ids ≡ 1 mod 1000: each one's re-encode partner
      // id−1 stays IN the corpus, so crawl probes emit real pairs),
      // bulk = 2% (ids ≡ 26 mod 50, partners ≡ 27 stay in corpus —
      // the SIG_CC_BULK_RATIO boundary)
      val corpus = sig.filter(pmod(col("id"), lit(1000)) =!= 1 &&
        pmod(col("id"), lit(50)) =!= 26).localCheckpoint()
      val crawl = sig.filter(pmod(col("id"), lit(1000)) === 1).localCheckpoint()
      val bulk = sig.filter(pmod(col("id"), lit(50)) === 26).localCheckpoint()
      val narrowIdx = java.nio.file.Files.createTempDirectory("graft_sbx_n").toString
      val wideIdx = java.nio.file.Files.createTempDirectory("graft_sbx_w").toString
      // both layouts FORCED (the auto dispatch is SIG_WIDE_BLOCKING_AT —
      // this sweep is what prices it), wide buckets at the adaptive rule
      val kbBits = math.min(12, math.max(6,
        math.ceil(math.log(n / 16384.0) / math.log(2.0)).toInt))
      var t0 = System.nanoTime()
      graft.ext.Dedup.buildSignatureIndexWithLayout(corpus, narrowIdx, wide = false)
      println(f"n=$n narrow build (untimed): ${(System.nanoTime() - t0) / 1e9}%.1f s")
      t0 = System.nanoTime()
      graft.ext.Dedup.buildSignatureIndexWithLayout(corpus, wideIdx,
        wide = true, kbBits = kbBits)
      println(f"n=$n wide build (untimed): ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"(kbBits=$kbBits)")

      def time(label: String, idx: String, batch: DataFrame): Double = {
        val secs = (1 to 2).map { i =>
          val t = System.nanoTime()
          val rows = graft.ext.Dedup.signatureIndexProbe(spark, idx, batch).count()
          val sec = (System.nanoTime() - t) / 1e9
          println(f"n=$n $label run$i: $sec%.2f s pairs=$rows")
          sec
        }
        secs.min
      }
      for ((cadence, batch) <- Seq(("crawl0.1%", crawl), ("bulk2%", bulk))) {
        val nSec = time(s"narrow $cadence", narrowIdx, batch)
        val wSec = time(s"wide   $cadence", wideIdx, batch)
        println(f"n=$n RESULT $cadence narrow=$nSec%.2f s wide=$wSec%.2f s " +
          f"ratio=${nSec / wSec}%.2f " +
          (if (wSec < nSec) "WIDE-WINS" else "NARROW-WINS"))
      }
      if (n == sizes.min) {
        // identity on the BULK batch (tens of thousands of true pairs —
        // an empty-vs-empty comparison would prove nothing)
        val a = graft.ext.Dedup.signatureIndexProbe(spark, narrowIdx, bulk)
        val b = graft.ext.Dedup.signatureIndexProbe(spark, wideIdx, bulk)
        val c = graft.ext.Dedup.hammingPairsIncremental64(corpus, bulk)
        val d1 = a.exceptAll(b).unionByName(b.exceptAll(a)).count()
        val d2 = a.exceptAll(c).unionByName(c.exceptAll(a)).count()
        println(s"n=$n identity (pairs=${a.count()}) narrow-vs-wide " +
          s"row-diff=$d1, narrow-vs-recompute row-diff=$d2 " +
          (if (d1 == 0 && d2 == 0) "IDENTICAL" else "MISMATCH"))
      }
      sig.unpersist(); corpus.unpersist(); crawl.unpersist(); bulk.unpersist()
    }
    spark.stop()
  }
}
