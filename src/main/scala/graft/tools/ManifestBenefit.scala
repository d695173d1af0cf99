package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pruned-vs-full measurement for the zone-map manifest
  * ([[graft.sources.Tables.writeStatsManifest]] /
  * [[graft.sources.Tables.manifestPrunedScan]]): one quarter's band
  * aggregated over a range-laid-out orders replica, answered (a) by a
  * plain filtered scan — every file listed, footer'd, and task-scheduled
  * even though parquet row-group stats then skip most pages — vs (b) the
  * manifest prune, which drops the files on the DRIVER so only the
  * surviving ones are ever opened. Warm-pair protocol, outputs checked
  * row-identical. The honest caveat: at local page-cache-resident sizes
  * the benefit is task-scheduling + footer CPU, not I/O — the term that
  * multiplies by ~800 k files at 100 TB.
  *
  * Usage: `ManifestBenefit [sfDir] [factor] [nFiles]`
  */
object ManifestBenefit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val nFiles = args.lift(2).map(_.toInt).getOrElse(256)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val o = graft.ScaleUp.scaleOrders(
      graft.sources.Tables.load(spark, sfDir, "orders"), factor)
    val dir = java.nio.file.Files.createTempDirectory("graft_manb").toString + "/orders"
    val t0 = System.nanoTime()
    graft.sources.Tables.writeRangeLayout(o, dir, "o_orderdate", nFiles)
    println(f"layout (one-time): ${(System.nanoTime() - t0) / 1e9}%.2f s ($nFiles files)")
    val t1 = System.nanoTime()
    graft.sources.Tables.writeStatsManifest(spark, dir, Seq("o_orderdate"))
    println(f"manifest (one-time): ${(System.nanoTime() - t1) / 1e9}%.2f s")
    val (lo, hi) = ("1995-01-01 00:00:00", "1995-03-31 00:00:00")
    val odt = spark.read.parquet(dir).schema("o_orderdate").dataType
    val (kept, total) = graft.sources.Tables.manifestKeptFiles(
      spark, dir, "o_orderdate", lo, hi)
    println(s"prune: kept ${kept.size} of $total files")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), graft.functions.Fns.dsum(col("o_totalprice")).as("s"))
    def time(tag: String)(f: => Long): Double = (1 to 2).map { i =>
      val t = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t) / 1e9
      println(f"$tag run$i: $sec%.2f s rows=$rows")
      sec
    }.min
    val fullSec = time("full-scan") {
      agg(spark.read.parquet(dir).filter(
        col("o_orderdate") >= lit(lo).cast(odt) &&
          col("o_orderdate") <= lit(hi).cast(odt))).count()
    }
    val prunedSec = time("manifest-pruned") {
      agg(graft.sources.Tables.manifestPrunedScan(
        spark, dir, "o_orderdate", lo, hi)).count()
    }
    val a = agg(spark.read.parquet(dir).filter(
      col("o_orderdate") >= lit(lo).cast(odt) &&
        col("o_orderdate") <= lit(hi).cast(odt)))
    val b = agg(graft.sources.Tables.manifestPrunedScan(
      spark, dir, "o_orderdate", lo, hi))
    val diff = a.exceptAll(b).unionByName(b.exceptAll(a)).count()
    println(f"full=$fullSec%.2f s pruned=$prunedSec%.2f s " +
      f"speedup=${fullSec / prunedSec}%.2f files=${kept.size}/$total " +
      f"row-diff=$diff " + (if (diff == 0) "IDENTICAL" else "MISMATCH"))
    spark.stop()
  }
}
