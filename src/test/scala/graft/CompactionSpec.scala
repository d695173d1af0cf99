package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Small-file compaction: row preservation, file-count math, atomic swap
  * leftovers, and partition-pruning behavior of date-partitioned layouts.
  */
class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(f =>
      f.isFile && f.getName.endsWith(".parquet"))

  test("compact rewrites many small files into few, preserving rows exactly") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val df = (1 to 5000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    // simulate accreted appends: 20 single-file writes
    df.repartition(20).write.mode("overwrite").parquet(dir)
    assert(parquetFiles(dir).length == 20)
    val before = rows(spark.read.parquet(dir))
    val totalBytes = parquetFiles(dir).map(_.length).sum
    val n = Tables.compact(spark, dir, targetFileBytes = (totalBytes / 2) + 1)
    assert(n == 2)
    assert(parquetFiles(dir).length == 2, "layout must match the computed file count")
    assert(rows(spark.read.parquet(dir)) == before, "rows must be preserved exactly")
    // no temp/backup leftovers
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains("_compact_")),
      "atomic swap must clean up its temp and backup dirs")
  }

  test("index-compaction swap is backup-recoverable: stale _backup dirs are cleared, live never orphaned") {
    val root = Files.createTempDirectory("graft_swapin").toString
    val docs = Seq((1L, "the quick brown fox"), (2L, "lazy dogs sleep here"))
      .toDF("doc_id", "text")
    graft.ext.Dedup.buildDedupIndex(docs, "doc_id", "text", root,
      n = 1, numHashes = 16, bands = 4)
    def probe() = rows(graft.ext.Dedup.minhashLshPairsAgainstIndex(spark, root,
      Seq((9L, "the quick brown fox")).toDF("doc_id", "text"),
      "doc_id", "text", n = 1, numHashes = 16, bands = 4, verifyThreshold = 0.9))
    val before = probe()
    assert(before.nonEmpty)
    // simulate an earlier CRASHED swap: a stale sets_backup left behind
    // (the crash window between rename-to-backup and backup delete)
    val stale = new java.io.File(s"$root/sets_backup")
    assert(stale.mkdir())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/sets_backup/junk.txt"), "stale")
    graft.ext.Dedup.dedupIndexCompact(spark, root, targetPartitions = 1)
    // compaction cleared the stale backup, swapped the fresh table in,
    // left no _compacting or _backup leftovers, and the probe is unchanged
    val leftovers = new java.io.File(root).listFiles()
      .filter(f => f.getName.endsWith("_backup") || f.getName.endsWith("_compacting"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
    assert(probe() == before)
  }

  test("compact to a large target yields one file") {
    val dir = Files.createTempDirectory("graft_compact1").toString + "/t"
    (1 to 100).toDF("k").repartition(7).write.mode("overwrite").parquet(dir)
    assert(Tables.compact(spark, dir) == 1)
    assert(parquetFiles(dir).length == 1)
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("compact on a hive-partitioned table compacts per partition, preserving layout") {
    val dir = Files.createTempDirectory("graft_compact_part").toString + "/t"
    val df = (1 to 3000).map(i => (i.toLong, s"2024-01-0${i % 3 + 1}")).toDF("id", "day")
    // many small files inside each partition directory
    df.repartition(10).write.mode("overwrite").partitionBy("day").parquet(dir)
    val partDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("day="))
    assert(partDirs.length == 3)
    assert(partDirs.forall(d => parquetFiles(d.toString).length == 10))
    val before = rows(spark.read.parquet(dir))
    val n = Tables.compact(spark, dir) // default target >> data: 1 file/partition
    assert(n == 3, s"expected one compacted file per partition, got $n")
    // the partition directories survive, each with a single data file
    val after = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("day="))
    assert(after.map(_.getName).sorted.sameElements(partDirs.map(_.getName).sorted),
      "partition layout must be preserved")
    assert(after.forall(d => parquetFiles(d.toString).length == 1))
    assert(rows(spark.read.parquet(dir)) == before, "rows must be preserved exactly")
    // pruning still works on the compacted layout
    val pruned = spark.read.parquet(dir).filter(col("day") === "2024-01-02")
    val filesRead = pruned.select(input_file_name()).distinct().as[String].collect()
    assert(filesRead.length == 1 && filesRead.head.contains("day=2024-01-02"),
      s"expected one pruned partition file, read: ${filesRead.mkString(", ")}")
  }

  test("date-partitioned write is partition-pruned on read") {
    val dir = Files.createTempDirectory("graft_part").toString + "/t"
    val df = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-01"),
      (3L, "2024-01-02"), (4L, "2024-01-03")
    ).toDF("id", "day")
    df.write.mode("overwrite").partitionBy("day").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("day") === "2024-01-02")
    assert(pruned.count() == 1)
    // the filter must prune at the DIRECTORY level, not post-scan: exactly
    // one partition's file is ever opened
    val filesRead = pruned.select(input_file_name()).distinct().as[String].collect()
    assert(filesRead.length == 1 && filesRead.head.contains("day=2024-01-02"),
      s"expected one pruned partition file, read: ${filesRead.mkString(", ")}")
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters"), "scan must carry PartitionFilters")
  }

  // --- compaction/ingest mutual exclusion (the CompactionLease) ---

  import graft.ext.{CompactionLease, Dedup}

  private def leasedBy[T](dir: String)(body: => T): T = {
    // hold the lease from ANOTHER thread, as a concurrent compactor
    // process would — the re-entrancy shortcut must not apply
    @volatile var leased = false
    @volatile var release = false
    val holder = new Thread(() =>
      CompactionLease.withLease(spark, dir) {
        leased = true
        while (!release) Thread.sleep(5)
      })
    holder.start()
    while (!leased) Thread.sleep(5)
    try body
    finally { release = true; holder.join() }
  }

  test("ingest during a held compaction lease fails loudly, writes nothing") {
    val dir = Files.createTempDirectory("graft_lease").toString + "/idx"
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    Dedup.buildDedupIndex(docs, "doc_id", "text", dir, n = 1,
      numHashes = 16, bands = 4)
    val before = spark.read.parquet(s"$dir/members").count()
    val batch = Seq((9L, "fresh words entirely")).toDF("doc_id", "text")
    val ex = leasedBy(dir) {
      intercept[CompactionLease.CompactionInProgressException] {
        Dedup.dedupIndexIngest(batch, "doc_id", "text", dir, n = 1,
          numHashes = 16, bands = 4)
      }
    }
    assert(ex.getMessage.contains("nothing was written"))
    // the pre-check fired BEFORE any append: the table is untouched,
    // the rows did not silently vanish into a doomed append
    assert(spark.read.parquet(s"$dir/members").count() == before)
    // once the lease is released the same ingest succeeds
    Dedup.dedupIndexIngest(batch, "doc_id", "text", dir, n = 1,
      numHashes = 16, bands = 4)
    assert(spark.read.parquet(s"$dir/members").count() == before + 1)
  }

  test("second concurrent compactor fails loudly; lease released after compact") {
    val dir = Files.createTempDirectory("graft_lease2").toString + "/idx"
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    Dedup.buildDedupIndex(docs, "doc_id", "text", dir, n = 1,
      numHashes = 16, bands = 4)
    leasedBy(dir) {
      intercept[CompactionLease.CompactionInProgressException] {
        Dedup.dedupIndexCompact(spark, dir)
      }: Unit
    }
    // lease gone -> compact runs clean and releases
    Dedup.dedupIndexCompact(spark, dir)
    assert(!new java.io.File(s"$dir/_compact_lease").exists())
  }

  test("stale lease from a crashed compactor is broken by the next one") {
    val dir = Files.createTempDirectory("graft_lease3").toString + "/idx"
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    Dedup.buildDedupIndex(docs, "doc_id", "text", dir, n = 1,
      numHashes = 16, bands = 4)
    // fabricate an abandoned lease older than the stale horizon
    val lease = new java.io.File(s"$dir/_compact_lease")
    assert(lease.createNewFile())
    assert(lease.setLastModified(
      System.currentTimeMillis() - CompactionLease.DefaultStaleLeaseMs - 60000))
    // an ingest treats the stale lease as absent (crashed compactor)
    Dedup.dedupIndexIngest(Seq((5L, "more text here")).toDF("doc_id", "text"),
      "doc_id", "text", dir, n = 1, numHashes = 16, bands = 4)
    // and a new compactor breaks it, runs, and releases
    Dedup.dedupIndexCompact(spark, dir)
    assert(!lease.exists())
  }

  test("statsManifestIngest is lease-guarded; Tables.compact holds the lease") {
    val dir = Files.createTempDirectory("graft_lease5").toString + "/t"
    (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Tables.writeStatsManifest(spark, dir, Seq("k")): Unit
    (101 to 200).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    // a table-level compactor (Tables.compact holds this same lease) in
    // progress: the sidecar append fails FAST, nothing written — without
    // the guard the compactor's swap would drop the sidecar file and the
    // staleness check would only catch it after the fact
    val ex = leasedBy(dir) {
      intercept[CompactionLease.CompactionInProgressException] {
        Tables.statsManifestIngest(spark, dir)
      }
    }
    assert(ex.getMessage.contains("nothing was written"))
    // lease released -> the same ingest succeeds and pruning works
    assert(Tables.statsManifestIngest(spark, dir) == 1)
    assert(Tables.manifestPrunedScan(spark, dir, "k", 0L, 1000L).count() == 200)
    // compact itself takes and releases the lease, rebuilding the manifest
    Tables.compact(spark, dir): Unit
    assert(!new java.io.File(s"$dir/_compact_lease").exists())
    assert(Tables.manifestPrunedScan(spark, dir, "k", 0L, 1000L).count() == 200)
  }

  test("dispatched components recompute takes and releases the lease around its swaps") {
    val dir = Files.createTempDirectory("graft_lease4").toString + "/idx"
    val sig = Seq((10L, 0x00L), (20L, 0xF0F0L)).toDF("id", "sig")
    Dedup.buildComponentsIndex(sig, dir)
    // default dispatch -> recompute route: takes the lease for its swaps,
    // then appends sigs through the guarded path on the same thread —
    // must complete without tripping its own lease
    Dedup.componentsIngest(spark, Seq((30L, 0x01L)).toDF("id", "sig"), dir)
    assert(!new java.io.File(s"$dir/_compact_lease").exists())
    assert(Dedup.componentsTable(spark, dir).count() == 3)
  }
}
