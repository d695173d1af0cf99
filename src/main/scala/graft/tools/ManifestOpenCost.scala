package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.LatencyFileSystem

/** [[ManifestBenefit]] at SIMULATED object-store open latency — the leg
  * the wall-parity caveat leaves open: the manifest's measured result at
  * local sizes is files-skipped (96%), and this tool prices those skips
  * in seconds by re-running the pruned-vs-full quarter-band aggregate
  * through [[graft.sources.LatencyFileSystem]] (`slow://`, a sleep per
  * file open) at 0 / 10 / 50 ms per GET. Expected shape: full-scan wall
  * grows by ~(opens × latency / parallelism) while the pruned scan's
  * open count — and so its added wall — stays proportional to the kept
  * fraction. Warm-pair protocol; outputs asserted row-identical between
  * the slow:// read and the plain read once per run.
  *
  * Usage: `ManifestOpenCost [sfDir] [factor] [nFiles]`
  */
object ManifestOpenCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val nFiles = args.lift(2).map(_.toInt).getOrElse(256)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.fs.slow.impl", classOf[LatencyFileSystem].getName)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val o = graft.ScaleUp.scaleOrders(
      graft.sources.Tables.load(spark, sfDir, "orders"), factor)
    val dir = java.nio.file.Files.createTempDirectory("graft_moc").toString + "/orders"
    graft.sources.Tables.writeRangeLayout(o, dir, "o_orderdate", nFiles): Unit
    graft.sources.Tables.writeStatsManifest(spark, dir, Seq("o_orderdate")): Unit
    val slowDir = "slow://" + dir
    val (lo, hi) = ("1995-01-01 00:00:00", "1995-03-31 00:00:00")
    val odt = spark.read.parquet(dir).schema("o_orderdate").dataType
    val (kept, total) = graft.sources.Tables.manifestKeptFiles(
      spark, slowDir, "o_orderdate", lo, hi)
    println(s"prune: kept ${kept.size} of $total files")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          graft.functions.Fns.dsum(col("o_totalprice")).as("s"))
    def fullScan() = agg(spark.read.parquet(slowDir).filter(
      col("o_orderdate") >= lit(lo).cast(odt) &&
        col("o_orderdate") <= lit(hi).cast(odt)))
    def prunedScan() = agg(graft.sources.Tables.manifestPrunedScan(
      spark, slowDir, "o_orderdate", lo, hi))
    // identity once, against the plain (file://) read
    val plain = agg(spark.read.parquet(dir).filter(
      col("o_orderdate") >= lit(lo).cast(odt) &&
        col("o_orderdate") <= lit(hi).cast(odt)))
    val diff = plain.exceptAll(prunedScan())
      .unionByName(prunedScan().exceptAll(plain)).count()
    println(s"row-diff vs plain read: $diff " +
      (if (diff == 0) "IDENTICAL" else "MISMATCH"))
    def time(tag: String)(f: => Long): (Double, Long) = (1 to 2).map { i =>
      LatencyFileSystem.opens.set(0)
      val t = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t) / 1e9
      val opens = LatencyFileSystem.opens.get()
      println(f"$tag run$i: $sec%.2f s rows=$rows opens=$opens")
      (sec, opens)
    }.minBy(_._1)
    for (ms <- Seq(0L, 10L, 50L)) {
      LatencyFileSystem.latencyMs = ms
      val (fs, fo) = time(s"full   @${ms}ms")(fullScan().count())
      val (ps, po) = time(s"pruned @${ms}ms")(prunedScan().count())
      println(f"RESULT @${ms}ms full=$fs%.2f s ($fo opens) " +
        f"pruned=$ps%.2f s ($po opens) speedup=${fs / ps}%.2f")
    }
    spark.stop()
  }
}
