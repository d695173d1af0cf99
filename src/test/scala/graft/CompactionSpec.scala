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
}
