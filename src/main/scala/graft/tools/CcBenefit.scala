package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Day-2 measurement for the persisted COMPONENTS index: with the index
  * built ONCE (untimed) over the corpus, time a crawl batch's incremental
  * cluster maintenance ([[graft.ext.Dedup.componentsIngest]] +
  * [[graft.ext.Dedup.componentsTable]] read) against the full one-shot
  * recompute ([[graft.ext.Dedup.signatureComponents]] over corpus∪batch —
  * what a user without the index re-runs every crawl), then check the
  * assignments are identical. Signature frames are materialized untimed
  * (localCheckpoint) so both sides pay zero codec cost and the comparison
  * isolates the maintenance machinery. Text family analogously
  * ([[graft.ext.Dedup.dedupComponentsIngest]] vs
  * [[graft.ext.Dedup.minhashComponents]]) — there the batch shingles both
  * ways, so the delta is banding+CC scope, not I/O alone.
  *
  * Usage: `graft.tools.CcBenefit <sfDir> [modulus ...]` — batch =
  * `id % m == 0` (1000 → 0.1% crawl cadence; 10 → 10% bulk). Warm-pair
  * minima. Default sweep: 1000 10.
  */
object CcBenefit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val rest = args.drop(1).toSeq
    // optional family filter ("sig" / "text") before the moduli — at sf10
    // one 48 GB JVM does not survive both families back to back (the
    // checkpointed frames of earlier sections are still live and pinned
    // when the text identity check needs the heap; measured OOM in the
    // first sf10 run) — run each family, or each modulus, in its own JVM
    val families = rest.headOption match {
      case Some("sig") | Some("text") => Set(rest.head)
      case _ => Set("sig", "text")
    }
    val moduli = rest.filter(_.forall(_.isDigit)) match {
      case Nil => Seq(1000, 10)
      case ms => ms.map(_.toInt)
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.sources.Tables.load(spark, sfDir, "documents")


    def time(tag: String)(f: => Long): Double = (1 to 2).map { i =>
      val t = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t) / 1e9
      println(f"$tag run$i: $sec%.2f s rows=$rows")
      sec
    }.min

    // signature family: dHash frames materialized once, untimed
    val sig = graft.ext.Multimodal.imageDHash(
        graft.ext.Multimodal.synthesizePngs(d.select(
          col("doc_id").as("media_id"),
          (lit(16) + pmod(expr("doc_id DIV 2"), lit(32))).cast("int").as("width"),
          (lit(16) + pmod(expr("doc_id DIV 2") * 7, lit(24))).cast("int").as("height"),
          (pmod(col("doc_id"), lit(2)) === 1).as("alpha"),
          expr("doc_id DIV 2").cast("long").as("seed"))))
      .filter(col("ok"))
      .select(col("media_id").as("id"), col("dhash").as("sig"))
      .localCheckpoint()

    if (families("sig")) moduli.foreach { m =>
      println(s"== SIGNATURE family, modulus $m (batch = ${100.0 / m}% of docs) ==")
      val corpus = sig.filter(pmod(col("id"), lit(m)) =!= 0).localCheckpoint()
      val batch = sig.filter(pmod(col("id"), lit(m)) === 0).localCheckpoint()
      val idx = java.nio.file.Files.createTempDirectory("graft_cc_benefit").toString
      val t0 = System.nanoTime()
      graft.ext.Dedup.buildComponentsIndex(corpus, idx)
      println(f"build (one-time): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // incremental: ingest the batch, read the assignment. Each timed
      // run ingests into a FRESH copy of the built index (cp is cheap
      // next to the maintenance work and identical across runs).
      val maintainSec = time("ingest+read") {
        val run = java.nio.file.Files.createTempDirectory("graft_cc_run").toString
        org.apache.hadoop.fs.FileUtil.copy(
          new org.apache.hadoop.fs.Path(idx).getFileSystem(spark.sessionState.newHadoopConf()),
          new org.apache.hadoop.fs.Path(idx),
          new org.apache.hadoop.fs.Path(run).getFileSystem(spark.sessionState.newHadoopConf()),
          new org.apache.hadoop.fs.Path(run + "/idx"),
          false, spark.sessionState.newHadoopConf())
        // recomputeBelow = 0 pins the union-find: this row measures the
        // raw MAINTENANCE machinery the dispatcher routes away from
        graft.ext.Dedup.componentsIngest(spark, batch, run + "/idx",
          recomputeBelow = 0L)
        graft.ext.Dedup.componentsTable(spark, run + "/idx").count()
      }
      val recomputeSec = time("full-recompute") {
        graft.ext.Dedup.signatureComponents(corpus.unionByName(batch)).count()
      }
      // the durable form of the recompute side: the route the dispatcher
      // actually takes pays an O(store) comps rewrite + sigs append +
      // table read on top of the compute-only row above — THIS is the
      // number maintenance must be compared against (the r13 lesson:
      // compute-only comparison overstated recompute at crawl cadence)
      def lifecycleRun(tag: String)(recomputeBelow: Long, bulkRatio: Double): Double =
        time(tag) {
          val run = java.nio.file.Files.createTempDirectory("graft_cc_dsp").toString
          org.apache.hadoop.fs.FileUtil.copy(
            new org.apache.hadoop.fs.Path(idx).getFileSystem(spark.sessionState.newHadoopConf()),
            new org.apache.hadoop.fs.Path(idx),
            new org.apache.hadoop.fs.Path(run).getFileSystem(spark.sessionState.newHadoopConf()),
            new org.apache.hadoop.fs.Path(run + "/idx"),
            false, spark.sessionState.newHadoopConf())
          graft.ext.Dedup.componentsIngest(spark, batch, run + "/idx",
            recomputeBelow = recomputeBelow, bulkRatio = bulkRatio)
          graft.ext.Dedup.componentsTable(spark, run + "/idx").count()
        }
      val recRouteSec = lifecycleRun("recompute-route+read")(Long.MaxValue, 0.0)
      // DEFAULT dispatch: expected to land on the cheaper LIFECYCLE side
      val dispatchSec = lifecycleRun("dispatched-ingest+read")(
        graft.ext.Dedup.SIG_CC_RECOMPUTE_BELOW, graft.ext.Dedup.SIG_CC_BULK_RATIO)
      val cheaper = math.min(maintainSec, recRouteSec)
      println(f"modulus $m SIGNATURE dispatched=$dispatchSec%.2f s " +
        f"(maintain=$maintainSec%.2f recompute-route=$recRouteSec%.2f " +
        f"recompute-compute-only=$recomputeSec%.2f; " +
        f"picks-cheaper=${dispatchSec <= cheaper * 1.15})")
      // identity: ingest once more into a fresh copy, diff vs recompute
      val run = java.nio.file.Files.createTempDirectory("graft_cc_id").toString
      org.apache.hadoop.fs.FileUtil.copy(
        new org.apache.hadoop.fs.Path(idx).getFileSystem(spark.sessionState.newHadoopConf()),
        new org.apache.hadoop.fs.Path(idx),
        new org.apache.hadoop.fs.Path(run).getFileSystem(spark.sessionState.newHadoopConf()),
        new org.apache.hadoop.fs.Path(run + "/idx"),
        false, spark.sessionState.newHadoopConf())
      graft.ext.Dedup.componentsIngest(spark, batch, run + "/idx")
      val inc = graft.ext.Dedup.componentsTable(spark, run + "/idx")
      val full = graft.ext.Dedup.signatureComponents(corpus.unionByName(batch))
      val diff = inc.exceptAll(full).unionByName(full.exceptAll(inc)).count()
      println(f"modulus $m SIGNATURE: maintain=$maintainSec%.2f s " +
        f"recompute=$recomputeSec%.2f s speedup=${recomputeSec / maintainSec}%.2f " +
        f"row-diff=$diff " + (if (diff == 0) "IDENTICAL" else "MISMATCH"))
    }

    if (families("text")) moduli.foreach { m =>
      println(s"== TEXT family, modulus $m (batch = ${100.0 / m}% of docs) ==")
      val corpus = d.filter(pmod(col("doc_id"), lit(m)) =!= 0)
      val batch = d.filter(pmod(col("doc_id"), lit(m)) === 0)
      val idx = java.nio.file.Files.createTempDirectory("graft_tcc_benefit").toString
      val t0 = System.nanoTime()
      graft.ext.Dedup.buildDedupComponentsIndex(corpus, "doc_id", "text", idx, n = 1)
      println(f"build (one-time): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val maintainSec = time("ingest+read") {
        val run = java.nio.file.Files.createTempDirectory("graft_tcc_run").toString
        org.apache.hadoop.fs.FileUtil.copy(
          new org.apache.hadoop.fs.Path(idx).getFileSystem(spark.sessionState.newHadoopConf()),
          new org.apache.hadoop.fs.Path(idx),
          new org.apache.hadoop.fs.Path(run).getFileSystem(spark.sessionState.newHadoopConf()),
          new org.apache.hadoop.fs.Path(run + "/idx"),
          false, spark.sessionState.newHadoopConf())
        graft.ext.Dedup.dedupComponentsIngest(spark, batch, "doc_id", "text",
          run + "/idx", n = 1, corpusForBulk = Some(corpus))
        graft.ext.Dedup.componentsTable(spark, run + "/idx").count()
      }
      val recomputeSec = time("full-recompute") {
        graft.ext.Dedup.minhashComponents(d, "doc_id", "text", n = 1).count()
      }
      val run = java.nio.file.Files.createTempDirectory("graft_tcc_id").toString
      org.apache.hadoop.fs.FileUtil.copy(
        new org.apache.hadoop.fs.Path(idx).getFileSystem(spark.sessionState.newHadoopConf()),
        new org.apache.hadoop.fs.Path(idx),
        new org.apache.hadoop.fs.Path(run).getFileSystem(spark.sessionState.newHadoopConf()),
        new org.apache.hadoop.fs.Path(run + "/idx"),
        false, spark.sessionState.newHadoopConf())
      graft.ext.Dedup.dedupComponentsIngest(spark, batch, "doc_id", "text",
        run + "/idx", n = 1, corpusForBulk = Some(corpus))
      val inc = graft.ext.Dedup.componentsTable(spark, run + "/idx")
      val full = graft.ext.Dedup.minhashComponents(d, "doc_id", "text", n = 1)
      val diff = inc.exceptAll(full).unionByName(full.exceptAll(inc)).count()
      println(f"modulus $m TEXT: maintain=$maintainSec%.2f s " +
        f"recompute=$recomputeSec%.2f s speedup=${recomputeSec / maintainSec}%.2f " +
        f"row-diff=$diff " + (if (diff == 0) "IDENTICAL" else "MISMATCH"))
    }
    spark.stop()
  }
}
