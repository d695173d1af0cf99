package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Day-2 measurement for the persisted SIGNATURE index (the
  * [[tools.IndexBenefit]] protocol applied to the third index family):
  * with the index built ONCE from the stored corpus's dHashes (untimed
  * in the comparison — signatures persist, that is the point), time a
  * crawl batch gated two ways:
  *
  *  - probe-against-index: batch codec pass + bucket-pruned
  *    [[graft.ext.Dedup.signatureIndexProbe]] — O(|batch| + matched
  *    buckets), the stored corpus's PAYLOADS are never touched
  *  - direct-recompute: [[graft.ext.Dedup.hammingPairsIncremental64]]
  *    with the store side re-derived from media — the full corpus codec
  *    pass every batch, the cost a pipeline without the index pays
  *
  * The asymmetry is starker than the MinHash case: the store side's
  * signature derivation is a CODEC stage (decode every stored image),
  * so recompute is O(corpus) decode work while the probe pays only the
  * batch's decodes. Warm-pair protocol: each path twice, read minima.
  *
  * Usage: `graft.tools.SigIndexBenefit <sfDir> [batchModulus]` — batch =
  * `doc_id % batchModulus == 1` (default 10; crawl cadence ~1000).
  */
object SigIndexBenefit {
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
    val spec = d.select(
      col("doc_id").as("media_id"),
      (lit(16) + pmod(expr("doc_id DIV 2"), lit(32))).cast("int").as("width"),
      (lit(16) + pmod(expr("doc_id DIV 2") * 7, lit(24))).cast("int").as("height"),
      (pmod(col("doc_id"), lit(2)) === 1).as("alpha"),
      expr("doc_id DIV 2").cast("long").as("seed"))
    def sigs(s: org.apache.spark.sql.DataFrame) =
      graft.ext.Multimodal.imageDHash(graft.ext.Multimodal.synthesizePngs(s))
        .filter(col("ok"))
        .select(col("media_id").as("id"), col("dhash").as("sig"))
    val corpusSpec = spec.filter(pmod(col("media_id"), lit(m)) =!= 1)
    val batchSpec = spec.filter(pmod(col("media_id"), lit(m)) === 1)
    val idx = java.nio.file.Files.createTempDirectory("graft_sigidx_benefit").toString
    val t0 = System.nanoTime()
    graft.ext.Dedup.buildSignatureIndex(sigs(corpusSpec), idx)
    println(f"build (one-time): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    def time(tag: String)(f: => Long): Unit = (1 to 2).foreach { i =>
      val t = System.nanoTime()
      val rows = f
      println(f"$tag run$i: ${(System.nanoTime() - t) / 1e9}%.2f s rows=$rows")
    }
    time("probe-against-index") {
      graft.ext.Dedup.signatureIndexProbe(spark, idx, sigs(batchSpec)).count()
    }
    time("direct-recompute") {
      graft.ext.Dedup.hammingPairsIncremental64(sigs(corpusSpec), sigs(batchSpec))
        .count()
    }
    spark.stop()
  }
}
