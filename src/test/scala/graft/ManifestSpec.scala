package graft

import org.apache.spark.sql.functions._

/** File-level zone-map manifest ([[graft.sources.Tables.writeStatsManifest]]
  * / [[graft.sources.Tables.manifestPrunedScan]]): the driver-side
  * file-skipping layer over the clustering writers. The contract under
  * test: pruned scan ≡ plain filtered scan row-for-row, files actually
  * skipped when the layout clusters the key, stale manifests fail LOUDLY
  * (never a silent wrong answer), and null-key rows/files are handled by
  * construction (a range predicate matches no null).
  */
class ManifestSpec extends SparkTestBase {
  import spark.implicits._

  private def dataFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))

  test("pruned scan equals full filter and skips files on a range layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_man").toString + "/t"
    val df = (1 to 20000).map(i => ((i * 2654435761L) % 99991, i.toLong)).toDF("k", "v")
    graft.sources.Tables.writeRangeLayout(df, dir, "k", 16)
    val n = graft.sources.Tables.writeStatsManifest(spark, dir, Seq("k"))
    assert(n == 16)
    val (kept, total) = graft.sources.Tables.manifestKeptFiles(spark, dir, "k", 10000L, 20000L)
    assert(total == 16)
    assert(kept.nonEmpty && kept.size < total,
      s"a ~10% band over a range layout must prune most files, kept ${kept.size}/$total")
    val pruned = graft.sources.Tables.manifestPrunedScan(spark, dir, "k", 10000L, 20000L)
      .select("k", "v").as[(Long, Long)].collect().sorted
    val full = spark.read.parquet(dir)
      .filter(col("k") >= 10000L && col("k") <= 20000L)
      .select("k", "v").as[(Long, Long)].collect().sorted
    assert(pruned.nonEmpty && pruned.toSeq == full.toSeq)
  }

  test("z-order manifest prunes on EITHER dimension") {
    val dir = java.nio.file.Files.createTempDirectory("graft_manz").toString + "/t"
    val rnd = new scala.util.Random(7)
    val df = (1 to 20000).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .toDF("x", "y")
    graft.sources.Tables.writeZOrderLayout(df, dir, "x", "y", nFiles = 16)
    graft.sources.Tables.writeStatsManifest(spark, dir, Seq("x", "y"))
    for (key <- Seq("x", "y")) {
      val (kept, total) = graft.sources.Tables.manifestKeptFiles(spark, dir, key, 0L, 99L)
      assert(kept.size < total, s"10% band on $key kept ${kept.size}/$total files")
      val pruned = graft.sources.Tables.manifestPrunedScan(spark, dir, key, 0L, 99L)
        .select("x", "y").as[(Long, Long)].collect().sorted
      val full = spark.read.parquet(dir)
        .filter(col(key) >= 0L && col(key) <= 99L)
        .select("x", "y").as[(Long, Long)].collect().sorted
      assert(pruned.nonEmpty && pruned.toSeq == full.toSeq)
    }
  }

  test("conjunctive two-band prune keeps only the query-rectangle tiles") {
    val dir = java.nio.file.Files.createTempDirectory("graft_manr").toString + "/t"
    val rnd = new scala.util.Random(11)
    val df = (1 to 40000).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .toDF("x", "y")
    graft.sources.Tables.writeZOrderLayout(df, dir, "x", "y", nFiles = 64)
    graft.sources.Tables.writeStatsManifest(spark, dir, Seq("x", "y"))
    val (keptX, total) = graft.sources.Tables.manifestKeptFiles(spark, dir, "x", 0L, 249L)
    val (keptRect, _) = graft.sources.Tables.manifestKeptFilesMulti(
      spark, dir, Seq(("x", 0L, 249L), ("y", 0L, 249L)))
    // the rectangle keeps strictly fewer tiles than either stripe alone
    assert(keptRect.size < keptX.size && keptX.size < total,
      s"rect ${keptRect.size} < x-stripe ${keptX.size} < $total expected")
    val pruned = graft.sources.Tables.manifestPrunedScanMulti(
        spark, dir, Seq(("x", 0L, 249L), ("y", 0L, 249L)))
      .select("x", "y").as[(Long, Long)].collect().sorted
    val full = spark.read.parquet(dir)
      .filter(col("x") <= 249L && col("y") <= 249L)
      .select("x", "y").as[(Long, Long)].collect().sorted
    assert(pruned.nonEmpty && pruned.toSeq == full.toSeq)
  }

  test("out-of-domain band keeps zero files and returns an empty, schema-correct frame") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mane").toString + "/t"
    (1 to 100).map(i => (i.toLong, s"r$i")).toDF("k", "s")
      .repartition(4).write.mode("overwrite").parquet(dir)
    graft.sources.Tables.writeStatsManifest(spark, dir, Seq("k"))
    val (kept, total) = graft.sources.Tables.manifestKeptFiles(spark, dir, "k", 5000L, 6000L)
    assert(kept.isEmpty && total > 0)
    val out = graft.sources.Tables.manifestPrunedScan(spark, dir, "k", 5000L, 6000L)
    assert(out.columns.toSeq == Seq("k", "s"))
    assert(out.count() == 0)
  }

  test("stale manifest fails loudly after the file set changes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mans").toString + "/t"
    (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    graft.sources.Tables.writeStatsManifest(spark, dir, Seq("k"))
    (101 to 200).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      graft.sources.Tables.manifestPrunedScan(spark, dir, "k", 0L, 1000L)
    }
    assert(e.getMessage.contains("stale manifest"))
    // rebuild repairs it — and the appended rows are visible again
    graft.sources.Tables.writeStatsManifest(spark, dir, Seq("k"))
    assert(graft.sources.Tables.manifestPrunedScan(spark, dir, "k", 0L, 1000L)
      .count() == 200)
  }

  test("null keys: all-null files prune, mixed files keep, no null row ever returned") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mann").toString + "/t"
    val mixed = (1 to 100).map(i =>
      (if (i % 10 == 0) None else Some(i.toLong), i.toLong)).toDF("k", "v")
    mixed.coalesce(1).write.mode("overwrite").parquet(dir)
    // a second, ALL-null-key file: its manifest stats are null, which the
    // keep predicate must treat as "cannot match a range" — skipped
    (1 to 50).map(i => (None: Option[Long], (1000 + i).toLong)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    graft.sources.Tables.writeStatsManifest(spark, dir, Seq("k"))
    val (kept, total) = graft.sources.Tables.manifestKeptFiles(spark, dir, "k", 1L, 100L)
    assert(total == 2 && kept.size == 1, s"all-null file must prune: kept ${kept.size}/$total")
    val rows = graft.sources.Tables.manifestPrunedScan(spark, dir, "k", 1L, 100L)
      .select("v").as[Long].collect().sorted
    assert(rows.toSeq == (1 to 100).filter(_ % 10 != 0).map(_.toLong))
  }

  test("statsManifestIngest: O(batch) maintenance after appends; duplicate rows tolerated") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mani").toString + "/t"
    (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    graft.sources.Tables.writeStatsManifest(spark, dir, Seq("k"))
    // two appended files -> stale; ingest scans ONLY them
    (101 to 200).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    (201 to 300).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    intercept[IllegalArgumentException] {
      graft.sources.Tables.manifestPrunedScan(spark, dir, "k", 0L, 1000L)
    }
    assert(graft.sources.Tables.statsManifestIngest(spark, dir) == 2)
    val (kept, total) = graft.sources.Tables.manifestKeptFiles(spark, dir, "k", 150L, 250L)
    assert(total == 3 && kept.size == 2, s"kept ${kept.size}/$total")
    assert(graft.sources.Tables.manifestPrunedScan(spark, dir, "k", 150L, 250L)
      .count() == 101)
    // idempotent: nothing new -> 0, manifest unchanged
    assert(graft.sources.Tables.statsManifestIngest(spark, dir) == 0)
    // a racing/replayed ingest's duplicate rows are bit-identical and the
    // prune reads DISTINCT — force the condition by re-appending one
    // file's manifest rows verbatim
    val man = spark.read.parquet(s"$dir/_graft_manifest")
    man.limit(1).write.mode("append").parquet(s"$dir/_graft_manifest")
    val (kept2, total2) = graft.sources.Tables.manifestKeptFiles(spark, dir, "k", 150L, 250L)
    assert(total2 == 3 && kept2.size == 2)
    assert(graft.sources.Tables.manifestPrunedScan(spark, dir, "k", 150L, 250L)
      .count() == 101)
  }

  test("compact rebuilds an existing manifest over the compacted files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_manc").toString + "/t"
    val df = (1 to 20000).map(i => ((i * 2654435761L) % 99991, i.toLong)).toDF("k", "v")
    graft.sources.Tables.writeRangeLayout(df, dir, "k", 16)
    graft.sources.Tables.writeStatsManifest(spark, dir, Seq("k"))
    val n = graft.sources.Tables.compact(spark, dir, targetFileBytes = 1L << 20)
    // no stale error: the pruning layer survived the rewrite
    val (_, total) = graft.sources.Tables.manifestKeptFiles(spark, dir, "k", 0L, 99990L)
    assert(total == n)
    val full = spark.read.parquet(dir)
      .filter(col("k") >= 10000L && col("k") <= 20000L).count()
    assert(graft.sources.Tables.manifestPrunedScan(spark, dir, "k", 10000L, 20000L)
      .count() == full)
  }

  test("partitioned manifests: per-leaf zone maps compose with partition columns in the output") {
    val dir = java.nio.file.Files.createTempDirectory("graft_manpl").toString + "/t"
    (1 to 8000).map(i => ((i * 2654435761L) % 9991, i.toLong, i % 4))
      .toDF("k", "v", "part")
      .repartitionByRange(16, col("part"), col("k"))
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    val n = graft.sources.Tables.writeStatsManifestPartitioned(spark, dir, Seq("k"))
    assert(n >= 4, s"expected at least one file per partition, got $n")
    val pruned = graft.sources.Tables.manifestPrunedScanPartitioned(
      spark, dir, "k", 1000L, 2000L)
    // partition column present and typed — the plain-read schema
    assert(pruned.columns.toSet == Set("k", "v", "part"))
    val got = pruned.select("k", "v", "part").as[(Long, Long, Int)].collect().sorted
    val want = spark.read.parquet(dir)
      .filter(col("k") >= 1000L && col("k") <= 2000L)
      .select("k", "v", "part").as[(Long, Long, Int)].collect().sorted
    assert(got.nonEmpty && got.toSeq == want.toSeq)
    // file-level pruning actually happened inside the leaves
    val keptTotal = graft.sources.Tables.partitionLeaves(spark, dir).map { l =>
      val (kept, total) = graft.sources.Tables.manifestKeptFiles(spark, l, "k", 1000L, 2000L)
      (kept.size, total)
    }
    assert(keptTotal.map(_._1).sum < keptTotal.map(_._2).sum)
    // staleness stays per-leaf and loud
    (1 to 10).map(i => ((9000 + i).toLong, i.toLong)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(s"$dir/part=2")
    val e = intercept[IllegalArgumentException] {
      graft.sources.Tables.manifestPrunedScanPartitioned(spark, dir, "k", 0L, 99999L)
    }
    assert(e.getMessage.contains("stale manifest"))
  }

  test("partitioned ingest: appends into old leaves AND a brand-new partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_manpi").toString + "/t"
    (1 to 4000).map(i => ((i * 2654435761L) % 9991, i.toLong, i % 3))
      .toDF("k", "v", "part")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    graft.sources.Tables.writeStatsManifestPartitioned(spark, dir, Seq("k"))
    // extra file into an existing leaf + a brand-new partition value
    Seq((50L, 9001L, 1), (75L, 9002L, 7), (80L, 9003L, 7))
      .toDF("k", "v", "part").coalesce(1)
      .write.mode("append").partitionBy("part").parquet(dir)
    intercept[IllegalArgumentException] {
      graft.sources.Tables.manifestPrunedScanPartitioned(spark, dir, "k", 0L, 99999L)
    }
    assert(graft.sources.Tables.statsManifestIngestPartitioned(spark, dir) == 2)
    val got = graft.sources.Tables.manifestPrunedScanPartitioned(
        spark, dir, "k", 40L, 90L)
      .select("k", "v", "part").as[(Long, Long, Int)].collect().sorted
    val want = spark.read.parquet(dir)
      .filter(col("k") >= 40L && col("k") <= 90L)
      .select("k", "v", "part").as[(Long, Long, Int)].collect().sorted
    assert(got.toSeq == want.toSeq)
    assert(got.exists(_._3 == 7), "the new partition's rows must be probe-visible")
    // idempotent
    assert(graft.sources.Tables.statsManifestIngestPartitioned(spark, dir) == 0)
  }

  test("hive-partitioned layout is rejected loudly (manifest the leaves instead)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_manp").toString + "/t"
    (1 to 100).map(i => (i.toLong, i % 4))
      .toDF("k", "part").write.mode("overwrite").partitionBy("part").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      graft.sources.Tables.writeStatsManifest(spark, dir, Seq("k"))
    }
    assert(e.getMessage.contains("subdirectories"))
  }

  test("missing manifest -> bootstrap message, not a raw path error") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mannone").toString + "/t"
    (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      graft.sources.Tables.manifestPrunedScan(spark, dir, "k", 0L, 5L)
    }
    assert(e.getMessage.contains("no manifest"), e.getMessage)
  }

  test("partitioned scan with a brand-new sidecar-less leaf reports bootstrap, not path-not-found") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mannl").toString + "/t"
    (1 to 400).map(i => (i.toLong, i % 2)).toDF("k", "part")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    graft.sources.Tables.writeStatsManifestPartitioned(spark, dir, Seq("k"))
    // ONLY a brand-new leaf appears (existing leaves untouched, so the
    // stale path cannot mask the missing-sidecar path)
    Seq((999L, 7)).toDF("k", "part")
      .coalesce(1).write.mode("append").partitionBy("part").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      graft.sources.Tables.manifestPrunedScanPartitioned(spark, dir, "k", 0L, 9999L)
    }
    assert(e.getMessage.contains("no manifest"), e.getMessage)
    assert(e.getMessage.contains("statsManifestIngestPartitioned"), e.getMessage)
    // the named repair works
    assert(graft.sources.Tables.statsManifestIngestPartitioned(spark, dir) == 1)
    assert(graft.sources.Tables.manifestPrunedScanPartitioned(spark, dir, "k", 0L, 9999L)
      .count() == 401)
  }

  test("a file rewritten in place under its name is caught by the length check") {
    val dir = java.nio.file.Files.createTempDirectory("graft_manlen").toString + "/t"
    (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    graft.sources.Tables.writeStatsManifest(spark, dir, Seq("k"))
    // an EXTERNAL writer rewrites a data file in place (same name, new
    // bytes — graft's own writers never do this); simulate by appending
    // junk bytes, which changes the length the manifest recorded
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .head
    val out = new java.io.FileOutputStream(part, true)
    out.write(Array.fill[Byte](64)(0)); out.close()
    val e = intercept[IllegalArgumentException] {
      graft.sources.Tables.manifestKeptFiles(spark, dir, "k", 0L, 1000L)
    }
    assert(e.getMessage.contains("stale manifest"), e.getMessage)
  }

  test("maintainManifest: no-op unmanifested; O(batch) flat; partitioned via the root marker") {
    // unmanifested -> 0, no sidecar appears
    val flat = java.nio.file.Files.createTempDirectory("graft_manm").toString + "/t"
    (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(flat)
    assert(graft.sources.Tables.maintainManifest(spark, flat) == 0)
    assert(!new java.io.File(s"$flat/_graft_manifest").exists())
    // flat manifested -> ingests exactly the appended files
    graft.sources.Tables.writeStatsManifest(spark, flat, Seq("k"))
    (101 to 200).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(flat)
    assert(graft.sources.Tables.maintainManifest(spark, flat) == 1)
    assert(graft.sources.Tables.manifestPrunedScan(spark, flat, "k", 0L, 1000L)
      .count() == 200)
    // partitioned manifested -> the root marker routes to the per-leaf
    // ingest, covering appends into old leaves AND a brand-new leaf
    val part = java.nio.file.Files.createTempDirectory("graft_manmp").toString + "/t"
    (1 to 400).map(i => (i.toLong, i % 2)).toDF("k", "part")
      .write.mode("overwrite").partitionBy("part").parquet(part)
    graft.sources.Tables.writeStatsManifestPartitioned(spark, part, Seq("k"))
    Seq((900L, 0), (901L, 5)).toDF("k", "part").coalesce(1)
      .write.mode("append").partitionBy("part").parquet(part)
    assert(graft.sources.Tables.maintainManifest(spark, part) == 2)
    assert(graft.sources.Tables.manifestPrunedScanPartitioned(spark, part, "k", 0L, 9999L)
      .count() == 402)
  }

  test("upsertParquet maintains an existing manifest across appends") {
    val dir = java.nio.file.Files.createTempDirectory("graft_manu").toString + "/t"
    graft.operators.Upsert.upsertParquet(spark,
      (1 to 100).map(i => (i.toLong, s"r$i")).toDF("k", "v"), dir, Seq("k")): Unit
    graft.sources.Tables.writeStatsManifest(spark, dir, Seq("k"))
    // second window overlaps the first: only the new keys append, and the
    // sidecar follows without any caller-side maintenance
    graft.operators.Upsert.upsertParquet(spark,
      (51 to 150).map(i => (i.toLong, s"r$i")).toDF("k", "v"), dir, Seq("k")): Unit
    val pruned = graft.sources.Tables.manifestPrunedScan(spark, dir, "k", 60L, 140L)
    assert(pruned.count() ==
      spark.read.parquet(dir).filter(col("k").between(60L, 140L)).count())
  }

  test("bloom point prune: IN-lookup on an unclustered key skips most files, survives ingest and compact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_manb").toString + "/t"
    // layout clusters k (range layout) — id is HIGH-CARDINALITY and
    // UNCLUSTERED, the shape min/max cannot prune
    val df = (1 to 20000)
      .map(i => ((i * 2654435761L) % 99991, i.toLong)).toDF("k", "id")
    graft.sources.Tables.writeRangeLayout(df, dir, "k", 32)
    graft.sources.Tables.writeStatsManifest(spark, dir, Seq("k", "id"),
      bloomCols = Seq("id"))
    // min/max on id is useless here: every file spans ~the whole domain,
    // so the range band keeps (almost) everything
    val (keptRange, total) = graft.sources.Tables.manifestKeptFiles(
      spark, dir, "id", 777L, 777L)
    assert(total == 32)
    assert(keptRange.size >= total / 2,
      s"unclustered min/max should keep most files, kept ${keptRange.size}")
    // the bloom keeps only the true file plus false positives
    val probe = Seq(777L, 12345L, 19999L)
    val (keptPt, _) = graft.sources.Tables.manifestKeptFilesPoint(
      spark, dir, "id", probe)
    assert(keptPt.size <= total / 4,
      s"bloom must skip most of $total files, kept ${keptPt.size} " +
        s"(range bands kept ${keptRange.size})")
    val got = graft.sources.Tables.manifestPrunedScanPoint(spark, dir, "id", probe)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == probe.sorted)
    // absent values: only false positives kept, zero rows returned
    val (keptAbs, _) = graft.sources.Tables.manifestKeptFilesPoint(
      spark, dir, "id", Seq(123456789L))
    assert(keptAbs.size <= 3, s"absent key kept ${keptAbs.size} files")
    assert(graft.sources.Tables.manifestPrunedScanPoint(
      spark, dir, "id", Seq(123456789L)).count() == 0)
    // O(batch) ingest preserves the bloom band with the SAME bits
    Seq((5L, 777777L)).toDF("k", "id")
      .coalesce(1).write.mode("append").parquet(dir)
    assert(graft.sources.Tables.statsManifestIngest(spark, dir) == 1)
    assert(graft.sources.Tables.manifestPrunedScanPoint(
      spark, dir, "id", Seq(777777L)).count() == 1)
    // compact rebuilds the manifest WITH its bloom columns
    graft.sources.Tables.compact(spark, dir): Unit
    assert(graft.sources.Tables.manifestPrunedScanPoint(
      spark, dir, "id", probe).count() == 3)
    // no bloom band for this key -> loud, actionable
    val e = intercept[IllegalArgumentException] {
      graft.sources.Tables.manifestKeptFilesPoint(spark, dir, "k", Seq(1L))
    }
    assert(e.getMessage.contains("no bloom band"), e.getMessage)
  }

  test("manifest does not cover the requested key -> loud error") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mank").toString + "/t"
    (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    graft.sources.Tables.writeStatsManifest(spark, dir, Seq("k"))
    val e = intercept[IllegalArgumentException] {
      graft.sources.Tables.manifestKeptFiles(spark, dir, "v", 0.0, 1.0)
    }
    assert(e.getMessage.contains("does not cover"))
  }
}
