package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crossover measurement for the signature-family components dispatch
  * ([[graft.ext.Dedup.componentsIngest]]'s `recomputeBelow` default):
  * at which stored-signature count does the O(|batch|) union-find
  * maintenance start beating the full [[graft.ext.Dedup.signatureComponents]]
  * re-cluster? The sf10 replica tops out at 500 k signatures (where
  * recompute wins at both cadences — BASELINE round 12), so this sweeps
  * SYNTHETIC decades shaped like the sf10 dHash corpus: two members per
  * signature class (the re-encode-pair structure) plus a 1-in-16
  * one-bit-flip near-dup tail, generated column-only (no codec cost on
  * either side, matching CcBenefit's signature-frame isolation).
  *
  * Per n: build the index untimed on all-but-batch, then warm-pair-time
  * (a) maintenance ingest+read with `recomputeBelow = 0` and (b) the
  * full recompute over stored ∪ batch, batch = 0.1% crawl cadence (the
  * cadence maintenance exists for; bulk only widens recompute's win).
  * Index copies for the mutating ingest are made OUTSIDE the timed
  * window. Identity (maintenance ≡ recompute) is asserted at the
  * smallest n.
  *
  * Usage: `graft.tools.SigCcCrossover [n ...]` — default sweep
  * 500k 1M 2M 4M 8M. Batch cadence via `SPARK_GRAFT_CC_MODULUS`
  * (default 1000 = 0.1%); at large n the cadence matters more than the
  * store size — a 0.1% batch of a 32 M store touches every one of the
  * 256 (chunk, kb) buckets, so the "pruned" probe reads the whole
  * store, while a micro-batch keeps the O(|batch|) promise.
  */
object SigCcCrossover {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(500000L, 1000000L, 2000000L, 4000000L, 8000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val hconf = spark.sessionState.newHadoopConf()

    def synthetic(n: Long): DataFrame =
      spark.range(n).select(col("id"), expr(
        """CASE WHEN id % 16 = 3
          |  THEN xxhash64(id DIV 2) ^ shiftleft(CAST(1 AS BIGINT),
          |         CAST(pmod(xxhash64(id), 64) AS INT))
          |  ELSE xxhash64(id DIV 2) END""".stripMargin).as("sig"))

    def copyIndex(src: String): String = {
      val run = java.nio.file.Files.createTempDirectory("graft_sigcc_run").toString
      org.apache.hadoop.fs.FileUtil.copy(
        new org.apache.hadoop.fs.Path(src).getFileSystem(hconf),
        new org.apache.hadoop.fs.Path(src),
        new org.apache.hadoop.fs.Path(run).getFileSystem(hconf),
        new org.apache.hadoop.fs.Path(run + "/idx"), false, hconf)
      run + "/idx"
    }

    val modulus = sys.env.getOrElse("SPARK_GRAFT_CC_MODULUS", "1000").toInt
    sizes.foreach { n =>
      val sig = synthetic(n).localCheckpoint()
      val corpus = sig.filter(pmod(col("id"), lit(modulus)) =!= 0).localCheckpoint()
      val batch = sig.filter(pmod(col("id"), lit(modulus)) === 0).localCheckpoint()
      val idx = java.nio.file.Files.createTempDirectory("graft_sigcc").toString
      val t0 = System.nanoTime()
      graft.ext.Dedup.buildComponentsIndex(corpus, idx)
      println(f"n=$n build (untimed): ${(System.nanoTime() - t0) / 1e9}%.2f s")

      val maintainSec = (1 to 2).map { i =>
        val run = copyIndex(idx) // fresh mutable copy, OUTSIDE the timing
        val t = System.nanoTime()
        graft.ext.Dedup.componentsIngest(spark, batch, run, recomputeBelow = 0L)
        val rows = graft.ext.Dedup.componentsTable(spark, run).count()
        val sec = (System.nanoTime() - t) / 1e9
        println(f"n=$n maintain run$i: $sec%.2f s rows=$rows")
        sec
      }.min
      val recomputeSec = (1 to 2).map { i =>
        val t = System.nanoTime()
        val rows = graft.ext.Dedup.signatureComponents(
          corpus.unionByName(batch)).count()
        val sec = (System.nanoTime() - t) / 1e9
        println(f"n=$n recompute run$i: $sec%.2f s rows=$rows")
        sec
      }.min
      if (n == sizes.min) {
        val run = copyIndex(idx)
        graft.ext.Dedup.componentsIngest(spark, batch, run, recomputeBelow = 0L)
        val inc = graft.ext.Dedup.componentsTable(spark, run)
        val full = graft.ext.Dedup.signatureComponents(corpus.unionByName(batch))
        val diff = inc.exceptAll(full).unionByName(full.exceptAll(inc)).count()
        println(s"n=$n identity row-diff=$diff " +
          (if (diff == 0) "IDENTICAL" else "MISMATCH"))
      }
      println(f"n=$n RESULT maintain=$maintainSec%.2f s recompute=$recomputeSec%.2f s " +
        f"ratio=${recomputeSec / maintainSec}%.2f " +
        (if (maintainSec < recomputeSec) "MAINTENANCE-WINS" else "RECOMPUTE-WINS"))
      sig.unpersist(); corpus.unpersist(); batch.unpersist()
    }
    spark.stop()
  }
}
