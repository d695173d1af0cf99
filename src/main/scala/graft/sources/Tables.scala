package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Parquet table catalog over a scale-factor directory.
  *
  * The reference pulls its inputs over HTTP-CSV and JDBC
  * ([function_app.py:56-73, 186-221]); the engine's equivalent is a
  * declarative scan whose filters/projections Catalyst pushes into the
  * parquet reader (SURVEY.md §2.1 S1-S7). At 100 TB these scans are the
  * dominant cost, so nothing here ever materializes eagerly: every loader
  * returns a lazy plan and predicate/column pruning happens at the source.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor. */
  val broadcastableDims: Set[String] = Set("region", "nation", "supplier", "part")

  /** Loads a corpus table. The `events` table stores `ts` as parquet
    * TIMESTAMP(NANOS), which Spark only reads as a nanosecond LongType
    * (with spark.sql.legacy.parquet.nanosAsLong=true — set by Session.builder
    * here); convert to TimestampType by flooring to micros, which matches
    * DuckDB's nanos→micros truncation so oracles agree.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        // timestamp_ntz, matching how Spark reads the driver's other
        // (isAdjustedToUTC=false) parquet timestamp columns — session tz
        // is UTC so the wall-clock value is identical either way.
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")).cast("timestamp_ntz"))
      case None => df
    }
  }

  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def events(spark: SparkSession, d: String): DataFrame = load(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** CSV source with header + schema inference — the Spark analog of the
    * reference's HTTP-CSV fetch ([function_app.py:56-73]): fetch-to-staging
    * then declarative scan, instead of an eager in-memory parse.
    */
  def csv(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(paths: _*)

  /** Newline-delimited JSON source (the other staging format an HTTP feed
    * commonly lands). Schema is inferred from the data; pass a DDL via
    * `schema` to skip the inference pass on large inputs — at scale,
    * inference is a full extra read.
    */
  def json(spark: SparkSession, paths: Seq[String], schema: Option[String] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(paths: _*)
  }

  /** ORC source — columnar like parquet, same pushdown/pruning behavior
    * through the DSv2 scan (PushedFilters/ReadSchema appear in explain the
    * same way), for lakes standardized on ORC.
    */
  def orc(spark: SparkSession, paths: String*): DataFrame =
    spark.read.orc(paths: _*)

  /** Range-partitioned, key-sorted parquet layout — the clustering lever
    * for tables that are mostly filtered on one key (time, tenant, id
    * range). `repartitionByRange` gives every output file a DISJOINT key
    * range and the within-partition sort makes each file's row groups
    * internally ordered, so a point or range predicate pushed into the
    * parquet reader skips every row group (and effectively every file —
    * footer-only reads) outside the key range. This is what turns a
    * 100 TB full-table scan into an I/O-proportional-to-selectivity scan
    * without a partition-directory explosion on high-cardinality keys
    * (hive-partitioning by a 10^9-value key is a small-files disaster;
    * range layout keeps file count a free parameter).
    *
    * Range boundaries come from Spark's reservoir sampling of the key —
    * balanced files even under key skew. Returns the written file count.
    */
  def writeRangeLayout(df: DataFrame, path: String, keyCol: String,
      nFiles: Int): Int = {
    require(nFiles >= 1, "nFiles must be >= 1")
    df.repartitionByRange(nFiles, org.apache.spark.sql.functions.col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(path)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Z-order (Morton-interleaved) parquet layout over TWO numeric keys —
    * the multi-dimensional complement of [[writeRangeLayout]]: a single-key
    * range layout bounds only its own key per file (a predicate on the
    * second dimension still touches every file); interleaving the two
    * quantized keys' bits makes each file a TILE in (a, b) space, so
    * min/max row-group stats bound BOTH dimensions and a selective
    * predicate on either key (or both) skips most files. This is
    * `OPTIMIZE ZORDER BY` in lakehouse engines, as a plain parquet writer.
    *
    * Both keys are linearly quantized to `bits`-bit codes on their
    * observed min/max (one tiny agg — a model-parameter collect), bits are
    * interleaved by a pure codegen'd bitwise expression, and the frame is
    * range-partitioned + sorted on the z-value — balanced files via the
    * same reservoir sampling as the range layout. Returns the file count.
    */
  def writeZOrderLayout(df: DataFrame, path: String, keyA: String, keyB: String,
      nFiles: Int, bits: Int = 16): Int = {
    import org.apache.spark.sql.functions._
    require(nFiles >= 1, "nFiles must be >= 1")
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val r = df.agg(
      min(col(keyA).cast("double")), max(col(keyA).cast("double")),
      min(col(keyB).cast("double")), max(col(keyB).cast("double"))).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      "writeZOrderLayout: keys must have at least one non-null value")
    val maxCode = (1L << bits) - 1
    def quantize(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(maxCode), greatest(lit(0L),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * maxCode)))
    val za = quantize(col(keyA), r.getDouble(0), r.getDouble(1))
    val zb = quantize(col(keyB), r.getDouble(2), r.getDouble(3))
    val z = (0 until bits).map { i =>
      shiftleft(shiftright(za, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(zb, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
    // Null keys must be gated EXPLICITLY: greatest/least SKIP null
    // arguments, so quantize() maps a null key to 0, not null — without
    // this gate null-key rows would silently co-locate with the (0,0)
    // corner tile and widen that file's min/max stats. They sort first
    // into their own z-bucket -1 instead.
    val zSafe = when(col(keyA).isNull || col(keyB).isNull, lit(-1L)).otherwise(z)
    df.withColumn("__graft_z", zSafe)
      .repartitionByRange(nFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Small-file compaction: rewrite a parquet table into files of
    * ~`targetFileBytes` each, atomically (write to a temp sibling, then
    * swap). Incremental appends — the reference's own upsert model
    * ([function_app.py:302-315]) and any streaming sink — accrete small
    * files until scan task scheduling and footer reads dominate; a 100 TB
    * table appended daily needs this as routine maintenance, like
    * `OPTIMIZE` in lakehouse formats.
    *
    * The rewrite repartitions round-robin by the computed file count (a
    * full shuffle — intended: it also fixes skewed file sizes, and the
    * alternative `coalesce` would collapse scan parallelism). Rows are
    * preserved exactly. Returns the new file count.
    *
    * A hive-partitioned table (key=value subdirectories) is compacted
    * per-partition, recursively: each leaf directory gets its own rewrite
    * and swap, so the partition layout — and the partition pruning it
    * enables — survives. An empty partition directory is left as-is.
    *
    * Concurrency contract: single writer, no concurrent readers of the
    * leaf being swapped. The two-rename swap keeps a full copy under one
    * of the two names at all times (crash-safe), but between the renames
    * the primary path briefly does not exist, and rename is not atomic on
    * object stores — a lakehouse table format (snapshot pointer commit) is
    * the right tool where concurrent readers are required.
    */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val entries = fs.listStatus(p).filter { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    val (dirs, dataFiles) = entries.partition(_.isDirectory)
    if (dirs.nonEmpty) {
      // partitioned layout: recurse into each partition directory so the
      // rewrite keeps the directory (and pruning) structure
      require(dataFiles.isEmpty,
        s"compact: $path mixes data files and subdirectories — not a " +
          "hive-partitioned layout; compact the leaves individually")
      return dirs.map(d => compact(spark, d.getPath.toString, targetFileBytes)).sum
    }
    if (dataFiles.isEmpty) return 0
    // Same compactor/appender mutual exclusion the index families enforce:
    // a concurrent [[statsManifestIngest]] (or any guarded append) fails
    // loudly instead of being dropped by the swap. The lease marker lives
    // INSIDE the table dir and travels into the backup at swap time, so
    // an append racing the brief post-swap window is caught by the
    // manifest staleness check (loud) rather than the lease — documented
    // residual, never silent.
    graft.ext.CompactionLease.withLease(spark, path) {
      compactFlatLeased(spark, path, targetFileBytes, fs, dataFiles)
    }
  }

  private def compactFlatLeased(spark: SparkSession, path: String,
      targetFileBytes: Long,
      fs: org.apache.hadoop.fs.FileSystem,
      dataFiles: Array[org.apache.hadoop.fs.FileStatus]): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val totalBytes = dataFiles.map(_.getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    // dot-prefixed siblings: invisible to parquet readers and to the
    // partition-directory recursion above even if a crash leaves them behind
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, s".${p.getName}._compact_tmp")
    val bak = new org.apache.hadoop.fs.Path(p.getParent, s".${p.getName}._compact_bak")
    fs.delete(tmp, true); fs.delete(bak, true)
    // a zone-map manifest travels with the directory into bak and would be
    // deleted with it — remember its full spec (keys, bloom columns, bloom
    // bits) so the pruning layer is REBUILT over the compacted files
    // instead of silently lost or narrowed (the rewrite invalidates every
    // per-file stat anyway)
    val (manifestKeys, manifestBlooms, manifestBits) =
      if (fs.exists(new org.apache.hadoop.fs.Path(p, ManifestDir)))
        manifestSpecOf(spark, path)
      else (Seq.empty[String], Seq.empty[String], 8192)
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: path -> bak, tmp -> path, drop bak; on failure the original
    // table is still present under either name, never half-replaced
    if (!fs.rename(p, bak)) sys.error(s"compact: could not move $path aside")
    if (!fs.rename(tmp, p)) {
      fs.rename(bak, p) // restore
      sys.error(s"compact: could not install compacted table at $path")
    }
    fs.delete(bak, true)
    if (manifestKeys.nonEmpty)
      writeStatsManifest(spark, path, manifestKeys, manifestBlooms,
        manifestBits): Unit
    nFiles
  }

  /** Sidecar directory of the per-file zone-map manifest. The leading
    * underscore makes it invisible to plain parquet reads of the table
    * (Spark's file index hides `_`/`.`-prefixed paths), so the manifest
    * can live INSIDE the table directory and travel with it.
    */
  val ManifestDir = "_graft_manifest"

  private def dataFileStatuses(spark: SparkSession,
      path: String): Array[org.apache.hadoop.fs.FileStatus] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(p).filter { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    require(entries.forall(_.isFile),
      s"stats manifest: $path has subdirectories — manifests cover flat " +
        "file layouts (the writeRangeLayout/writeZOrderLayout/compact " +
        "output shape); for hive-partitioned tables, manifest the leaves")
    entries
  }

  /** Per-FILE min/max zone-map manifest — the file-skipping statistics a
    * lakehouse table format maintains in its metadata layer, as a plain
    * parquet sidecar any engine can read. Parquet row-group stats already
    * let the READER skip pages, but only after the driver has listed the
    * file, scheduled a task, and read the footer; at 100 TB / 128 MB
    * files that is ~800 k footer reads and task launches for a query
    * that touches three files. The manifest moves the skip decision to
    * the DRIVER: one tiny parquet read, then only the surviving files are
    * ever opened. It composes with the clustering writers — after
    * [[writeRangeLayout]] each file bounds its own key tightly (1-D), and
    * after [[writeZOrderLayout]] each file is a tile in (a, b) space so a
    * predicate on EITHER key prunes (the 2-D case the range layout cannot
    * serve).
    *
    * One full scan computes count + min/max per key column per file
    * (grouped on `input_file_name`), amortized over every subsequent
    * pruned read — the same trade the layout writers already made. The
    * manifest row count is the FILE count, not the row count: a few MB at
    * 100 TB, written as one file. Zero-row files (possible after an empty
    * write) appear with cnt=0 and null stats, which no range predicate
    * matches — pruned, correctly. Returns the manifested file count.
    *
    * Optional per-file BLOOM columns for point-lookup keys
    * (`bloomCols`): min/max bands prune range predicates but are useless for
    * `key = x` / `key IN (...)` on a high-cardinality key that the layout
    * does NOT cluster (the `doc_id IN (...)` shape of a dedup-audit
    * query) — every file's [min, max] spans the whole domain. Each
    * `bloomCols` entry adds a `bloomBits`-bit, 2-hash bloom filter per
    * file (packed `array<long>`, bits/64 words), built by the same one
    * scan (two xxhash64 per row per column, bit_or-aggregated — no
    * per-file collection). [[manifestKeptFilesPoint]] tests membership on
    * the DRIVER; a false positive keeps a file needlessly (row-group
    * stats inside finish the job), a true key is NEVER pruned. Size the
    * bits to the rows per file: fpp/probe ≈ (1 − e^(−2n/bits))², ~3% at
    * n=750/bits=8192; at 1 M-row files use ~2²⁰ bits (128 KB/file — the
    * manifest stays millions of times smaller than the data).
    */
  def writeStatsManifest(spark: SparkSession, path: String,
      keyCols: Seq[String], bloomCols: Seq[String] = Nil,
      bloomBits: Int = 8192): Int = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "writeStatsManifest: at least one key column")
    require(bloomBits >= 64 && bloomBits % 64 == 0,
      "bloomBits must be a positive multiple of 64")
    import spark.implicits._
    // (name, byte length): the length rides along so the staleness check
    // can catch a file REWRITTEN IN PLACE under the same name by an
    // external writer (graft's own writers always mint fresh part names,
    // but the manifest must never silently prune with stale stats)
    val files = dataFileStatuses(spark, path)
      .map(st => (st.getPath.getName, st.getLen)).toSeq
    val stats = fileStatsFrame(spark.read.parquet(path), keyCols, bloomCols, bloomBits)
    val manifest = joinStats(files.toDF("file", "len"), stats, bloomCols, bloomBits)
    manifest.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/$ManifestDir")
    files.length
  }

  /** The one-scan stats frame behind both the full build and the
    * O(batch) ingest: per file (grouped on input_file_name) the row
    * count, each key's min/max, and each bloom column's packed word
    * array.
    */
  private def fileStatsFrame(df: DataFrame, keyCols: Seq[String],
      bloomCols: Seq[String], bloomBits: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val words = bloomBits / 64
    // Bloom bands aggregate through ONE packed-words buffer per column
    // ([[graft.functions.BloomWordsAgg]]): the probe positions are the
    // shared [[bloomPositions]] expressions (evaluated once per row), the
    // aggregate only sets bits — bit-identical to the previous
    // one-bit_or-per-word formulation, whose per-row cost scaled with the
    // word count (2·words xxhash64 evaluations per row; q254 measured
    // 126 s / 1.9e6 ms CPU at 586 words before this rewrite).
    val aggs = keyCols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max"))) ++
      bloomCols.map { c =>
        val ps = bloomPositions(col(c), bloomBits)
          .map(p => when(col(c).isNull, lit(-1L)).otherwise(p))
        graft.functions.BloomWordsAgg.bloomWords(words)(ps(0), ps(1))
          .as(s"${c}__bloom")
      }
    df.groupBy(substring_index(input_file_name(), "/", -1).as("file"))
      .agg(count(lit(1)).as("cnt"), aggs: _*)
  }

  /** Left-join the listing onto the stats and normalize the empty-file
    * row: cnt 0, null min/max (no range matches), and an all-zero bloom
    * rather than a null — the word count IS the bits parameter, and the
    * ingest recovers it from any row's array size.
    */
  private def joinStats(listing: DataFrame, stats: DataFrame,
      bloomCols: Seq[String], bloomBits: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val words = bloomBits / 64
    val joined = listing.join(stats, Seq("file"), "left")
      .na.fill(0L, Seq("cnt"))
    bloomCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}__bloom",
        coalesce(col(s"${c}__bloom"), array_repeat(lit(0L), words)))
    }
  }

  /** The two bloom probe positions of a value of column `c` — shared by
    * the build aggregation and the driver-side membership test so they
    * cannot disagree (both are the same xxhash64 evaluated by Spark).
    */
  private def bloomPositions(c: org.apache.spark.sql.Column,
      bits: Int): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions._
    Seq(pmod(xxhash64(c), lit(bits.toLong)),
      pmod(xxhash64(c, lit(0x9E3779B9L)), lit(bits.toLong)))
  }

  /** Driver-side prune against the manifest: the data files whose
    * [min, max] window on `keyCol` intersects the CLOSED band [lo, hi],
    * plus the total file count. Fails loudly on a STALE manifest (the
    * table's file set changed since [[writeStatsManifest]]) — silently
    * pruning with stale stats would drop rows; rebuild the manifest after
    * any append/compact/layout rewrite. The collect is file-COUNT-sized
    * (names only), the same driver-side footprint as Spark's own
    * in-memory file index for the unpruned read.
    */
  def manifestKeptFiles(spark: SparkSession, path: String, keyCol: String,
      lo: Any, hi: Any): (Seq[String], Int) =
    manifestKeptFilesMulti(spark, path, Seq((keyCol, lo, hi)))

  /** Conjunctive multi-band prune: a file survives only if EVERY band
    * intersects its window — the z-order case, where a (x-band AND
    * y-band) predicate reduces the keep set to the tiles in the query
    * RECTANGLE rather than either full stripe.
    */
  def manifestKeptFilesMulti(spark: SparkSession, path: String,
      bands: Seq[(String, Any, Any)]): (Seq[String], Int) = {
    import org.apache.spark.sql.functions._
    require(bands.nonEmpty, "manifest prune: at least one band")
    val listing = dataFileStatuses(spark, path)
      .map(st => (st.getPath.getName, st.getLen)).toSet
    // checked BEFORE the read so a table that never had (or lost) its
    // sidecar gets the actionable message, not a raw path-not-found
    // AnalysisException — the brand-new-hive-leaf case included
    val manPath = new org.apache.hadoop.fs.Path(path, ManifestDir)
    require(
      manPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(manPath),
      s"no manifest at $path — bootstrap with writeStatsManifest (or " +
        "writeStatsManifestPartitioned / statsManifestIngestPartitioned " +
        "for hive-partitioned tables)")
    val man = spark.read.parquet(s"$path/$ManifestDir")
    val keep = bands.map { case (keyCol, lo, hi) =>
      require(man.columns.contains(s"${keyCol}__min"),
        s"manifest at $path does not cover key '$keyCol' — rebuild with it")
      val dt = man.schema(s"${keyCol}__min").dataType
      col(s"${keyCol}__max") >= lit(lo).cast(dt) &&
        col(s"${keyCol}__min") <= lit(hi).cast(dt)
    }.reduce(_ && _)
    // distinct: a replayed statsManifestIngest appends bit-identical rows
    // for the same file — tolerated here, folded by the next rebuild
    val rows = man.select(col("file"), col("len"), keep.as("keep")).distinct().collect()
    // (name, length) pairs: a same-name in-place rewrite changes the
    // length and fails here instead of pruning with stale stats (an
    // equal-length rewrite is not detectable from FS metadata alone —
    // graft's writers never rewrite in place, so this is defense in depth
    // against external writers, not a completeness claim)
    val manFiles = rows.map(r => (r.getString(0), r.getLong(1))).toSet
    require(manFiles == listing,
      s"stale manifest at $path: file set changed since writeStatsManifest " +
        s"(${(listing -- manFiles).size} new-or-rewritten, " +
        s"${(manFiles -- listing).size} gone) — rebuild the manifest")
    (rows.filter(r => !r.isNullAt(2) && r.getBoolean(2))
      .map(r => s"$path/${r.getString(0)}").toSeq, rows.length)
  }

  /** Driver-side POINT prune against the manifest's bloom band: the data
    * files that may contain ANY of `values` for `keyCol` — the
    * `key IN (...)` shape min/max cannot serve on an unclustered
    * high-cardinality key. The probe positions are computed BY SPARK with
    * the table column's exact type (one 1-row job), so they match the
    * build's hashes bit-for-bit; the membership test itself is a
    * driver-side AND over the collected word arrays (file-count-sized,
    * like every manifest read). Same loud staleness/coverage contract as
    * the band prunes. False positives keep files needlessly; a stored key
    * is never pruned.
    */
  def manifestKeptFilesPoint(spark: SparkSession, path: String,
      keyCol: String, values: Seq[Any]): (Seq[String], Int) = {
    import org.apache.spark.sql.functions._
    require(values.nonEmpty, "manifest point prune: at least one value")
    val listing = dataFileStatuses(spark, path)
      .map(st => (st.getPath.getName, st.getLen)).toSet
    val manPath = new org.apache.hadoop.fs.Path(path, ManifestDir)
    require(
      manPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(manPath),
      s"no manifest at $path — bootstrap with writeStatsManifest (or " +
        "writeStatsManifestPartitioned / statsManifestIngestPartitioned " +
        "for hive-partitioned tables)")
    val man = spark.read.parquet(s"$path/$ManifestDir")
    require(man.columns.contains(s"${keyCol}__bloom"),
      s"manifest at $path has no bloom band for '$keyCol' — rebuild with " +
        s"""writeStatsManifest(..., bloomCols = Seq("$keyCol"))""")
    val rows = man.select(col("file"), col("len"), col(s"${keyCol}__bloom"))
      .distinct().collect()
    val manFiles = rows.map(r => (r.getString(0), r.getLong(1))).toSet
    require(manFiles == listing,
      s"stale manifest at $path: file set changed since writeStatsManifest " +
        s"(${(listing -- manFiles).size} new-or-rewritten, " +
        s"${(manFiles -- listing).size} gone) — rebuild the manifest")
    if (rows.isEmpty) return (Nil, 0)
    val bits = rows.head.getSeq[Long](2).length * 64
    val dt = spark.read.parquet(path).schema(keyCol).dataType
    val posRow = spark.range(1)
      .select(values.flatMap(v => bloomPositions(lit(v).cast(dt), bits)): _*)
      .head()
    val probes = values.indices
      .map(i => (posRow.getLong(2 * i), posRow.getLong(2 * i + 1)))
    def bitSet(words: Seq[Long], p: Long): Boolean =
      (words((p / 64).toInt) & (1L << (p % 64).toInt)) != 0
    val kept = rows.filter { r =>
      val words = r.getSeq[Long](2)
      probes.exists { case (a, b) => bitSet(words, a) && bitSet(words, b) }
    }.map(r => s"$path/${r.getString(0)}")
    (kept.toSeq, rows.length)
  }

  /** Point-lookup scan through the bloom band: read only the files whose
    * bloom may hold one of `values`, then re-apply the IN predicate
    * exactly. Row-identical to `read.parquet(path).filter(key IN values)`
    * — bloom false positives only widen the file set, never the rows.
    */
  def manifestPrunedScanPoint(spark: SparkSession, path: String,
      keyCol: String, values: Seq[Any]): DataFrame = {
    import org.apache.spark.sql.functions._
    val schema = spark.read.parquet(path).schema
    val dt = schema(keyCol).dataType
    val (kept, _) = manifestKeptFilesPoint(spark, path, keyCol, values)
    val base =
      if (kept.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      else spark.read.schema(schema).parquet(kept: _*)
    base.filter(col(keyCol).isin(values.map(v => lit(v).cast(dt)): _*))
  }

  /** The (keyCols, bloomCols, bloomBits) a manifest was built with, read
    * back from its own schema (+ one word-count probe when blooms exist)
    * — what [[statsManifestIngest]], [[compact]]'s rebuild and the
    * partitioned ingest's new-leaf bootstrap preserve across maintenance.
    */
  private def manifestSpecOf(spark: SparkSession,
      path: String): (Seq[String], Seq[String], Int) = {
    import org.apache.spark.sql.functions._
    val man = spark.read.parquet(s"$path/$ManifestDir")
    val keys = man.columns.filter(_.endsWith("__min"))
      .map(_.stripSuffix("__min")).toSeq
    val blooms = man.columns.filter(_.endsWith("__bloom"))
      .map(_.stripSuffix("__bloom")).toSeq
    val bits =
      if (blooms.isEmpty) 8192
      else man.select(size(col(s"${blooms.head}__bloom")) * 64)
        .limit(1).collect().headOption.map(_.getInt(0))
        .getOrElse(sys.error(
          s"manifest at $path has bloom columns but zero rows — cannot " +
            "recover bloomBits; rebuild with writeStatsManifest"))
    (keys, blooms, bits)
  }

  /** O(|batch|) manifest maintenance — the index-ingest discipline
    * applied to the zone-map layer: after an append lands new files in
    * the table, scan ONLY those files for their stats rows instead of
    * rebuilding the whole manifest (a crawl-cadence store appended every
    * micro-batch would otherwise pay a full-table scan per batch). Key
    * columns are recovered from the existing manifest's schema. The
    * append is one new parquet file in the sidecar; a crash mid-append
    * leaves the missing files still missing from the manifest, which the
    * staleness check turns into a LOUD error — never a silent wrong
    * prune. A REPLAYED ingest appends duplicate rows for the same file;
    * duplicates are bit-identical (same file, same stats) and
    * [[manifestKeptFilesMulti]] reads the manifest `DISTINCT`, so replay
    * is tolerated — the persisted-index contract. Returns the number of
    * newly manifested files.
    */
  def statsManifestIngest(spark: SparkSession, path: String): Int = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val man = spark.read.parquet(s"$path/$ManifestDir")
    val (keyCols, bloomCols, bloomBits) = manifestSpecOf(spark, path)
    val known = man.select(col("file")).as[String].collect().toSet
    val fresh = dataFileStatuses(spark, path)
      .filterNot(st => known(st.getPath.getName))
      .map(st => (st.getPath.getName, st.getLen)).toSeq
    if (fresh.isEmpty) return 0
    val stats = fileStatsFrame(
      spark.read
        .schema(spark.read.parquet(path).schema)
        .parquet(fresh.map { case (f, _) => s"$path/$f" }: _*),
      keyCols, bloomCols, bloomBits)
    val rows = joinStats(fresh.toDF("file", "len"), stats, bloomCols, bloomBits)
      .select(man.columns.map(col): _*) // align column order with the sidecar
    // Guarded like every other index family's appends: a [[compact]]
    // holding the table's lease would read-and-swap the very files this
    // ingest is summarizing — fail loudly instead (and even if an
    // unguarded writer raced the swap, the (file, len) staleness check at
    // prune time stays the loud backstop; the lease turns that
    // after-the-fact error into a fail-fast one).
    graft.ext.CompactionLease.guardedAppend(spark, path) {
      rows.coalesce(1).write.mode("append").parquet(s"$path/$ManifestDir")
    }
    fresh.size
  }

  /** Manifest-pruned scan: read ONLY the files the zone map keeps for the
    * closed band [lo, hi] on `keyCol`, then re-apply the predicate (file
    * granularity over-approximates; row-group stats inside the kept files
    * finish the job). Equals `read.parquet(path).filter(band)` row-for-row
    * — [[manifestKeptFiles]]'s intersect test keeps every file that can
    * hold a matching row, and a range predicate never matches null keys,
    * so null-stat (all-null or empty) files are safe to skip. An empty
    * keep set returns an empty frame with the table's schema, no file
    * ever opened.
    */
  def manifestPrunedScan(spark: SparkSession, path: String, keyCol: String,
      lo: Any, hi: Any): DataFrame =
    manifestPrunedScanMulti(spark, path, Seq((keyCol, lo, hi)))

  /** The `key=value` leaf directories of a hive-partitioned table,
    * recursing nested partition levels. A directory whose non-hidden
    * entries are all files is a leaf; mixing files and subdirectories is
    * rejected loudly (not a hive layout).
    */
  private[graft] def partitionLeaves(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(p).filter { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    val (dirs, files) = entries.partition(_.isDirectory)
    if (dirs.isEmpty) Seq(path)
    else {
      require(files.isEmpty,
        s"stats manifest: $path mixes data files and subdirectories — " +
          "not a hive-partitioned layout")
      dirs.toSeq.flatMap(d => partitionLeaves(spark, d.getPath.toString))
    }
  }

  /** [[writeStatsManifest]] for a hive-partitioned table: one per-leaf
    * manifest (recursing nested `key=value` levels), so DIRECTORY-level
    * partition pruning composes with FILE-level zone maps inside each
    * surviving partition — the two layers a lakehouse metadata tier
    * fuses, as plain sidecars. `keyCols` must be DATA columns (leaf
    * files do not store the partition columns; asking for one fails
    * loudly at the leaf scan). Returns the total manifested file count.
    */
  def writeStatsManifestPartitioned(spark: SparkSession, path: String,
      keyCols: Seq[String], bloomCols: Seq[String] = Nil,
      bloomBits: Int = 8192): Int = {
    val n = partitionLeaves(spark, path)
      .map(writeStatsManifest(spark, _, keyCols, bloomCols, bloomBits)).sum
    // root marker so [[maintainManifest]] can detect a manifested
    // PARTITIONED table with one O(1) metadata call instead of a
    // recursive leaf walk per micro-batch on every UN-manifested store
    val mk = new org.apache.hadoop.fs.Path(path, PartitionedManifestMarker)
    mk.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(mk, true).close()
    n
  }

  /** Root-level marker file written by [[writeStatsManifestPartitioned]];
    * underscore-prefixed so parquet reads never see it.
    */
  val PartitionedManifestMarker = "_graft_manifest_partitioned"

  /** The operational seam between the appending write paths and the
    * zone-map layer: if (and only if) `path` carries a manifest, ingest
    * stats for any files the manifest does not know yet — O(|batch|), the
    * [[statsManifestIngest]] discipline — so a store that appends every
    * micro-batch keeps its manifest fresh instead of going loudly stale
    * after the first batch. A table with no manifest costs one (flat) or
    * two (marker probe) filesystem metadata calls and nothing else.
    * Called by [[graft.operators.Upsert.upsertParquet]] and every
    * appending streaming sink after their store writes; bootstrap the
    * manifest ONCE ([[writeStatsManifest]] / the partitioned form) and
    * the write paths maintain it from then on. Returns the number of
    * newly manifested files (0 when unmanifested).
    */
  def maintainManifest(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else if (fs.exists(new org.apache.hadoop.fs.Path(p, ManifestDir)))
      statsManifestIngest(spark, path)
    else if (fs.exists(new org.apache.hadoop.fs.Path(p, PartitionedManifestMarker)))
      statsManifestIngestPartitioned(spark, path)
    else 0
  }

  /** [[statsManifestIngest]] over a hive-partitioned table — the shape a
    * crawl-cadence store actually grows in: appends land extra files in
    * EXISTING `key=value` leaves (O(batch) per-leaf ingest) and create
    * BRAND-NEW leaves (a new day's partition), which get a fresh sidecar
    * built from the key columns every existing sidecar already shares.
    * Returns the number of newly manifested files across all leaves.
    */
  def statsManifestIngestPartitioned(spark: SparkSession, path: String): Int = {
    val leaves = partitionLeaves(spark, path)
    def hasManifest(l: String): Boolean = {
      val mp = new org.apache.hadoop.fs.Path(l, ManifestDir)
      mp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(mp)
    }
    val seeded = leaves.find(hasManifest)
    require(seeded.nonEmpty,
      s"statsManifestIngestPartitioned: no leaf of $path has a manifest — " +
        "bootstrap with writeStatsManifestPartitioned first")
    val (keyCols, bloomCols, bloomBits) = manifestSpecOf(spark, seeded.get)
    leaves.map { l =>
      if (hasManifest(l)) statsManifestIngest(spark, l)
      else writeStatsManifest(spark, l, keyCols, bloomCols, bloomBits)
    }.sum
  }

  /** [[manifestPrunedScan]] over a hive-partitioned table: per-leaf
    * manifest prunes, then ONE read of the surviving files with
    * `basePath` set so Spark re-derives the partition columns from the
    * file paths — the output schema matches the plain partitioned read,
    * partition columns included (filter them on the result; their
    * pruning is directory-level and free). Staleness stays per-leaf and
    * loud.
    */
  def manifestPrunedScanPartitioned(spark: SparkSession, path: String,
      keyCol: String, lo: Any, hi: Any): DataFrame = {
    import org.apache.spark.sql.functions._
    val schema = spark.read.parquet(path).schema
    val dt = schema(keyCol).dataType
    val kept = partitionLeaves(spark, path).flatMap(l =>
      manifestKeptFilesMulti(spark, l, Seq((keyCol, lo, hi)))._1)
    val base =
      if (kept.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      else spark.read.option("basePath", path).parquet(kept: _*)
    base.filter(col(keyCol) >= lit(lo).cast(dt) && col(keyCol) <= lit(hi).cast(dt))
  }

  /** [[manifestPrunedScan]] for a conjunction of bands (tile-intersection
    * prune over a z-order layout).
    */
  def manifestPrunedScanMulti(spark: SparkSession, path: String,
      bands: Seq[(String, Any, Any)]): DataFrame = {
    import org.apache.spark.sql.functions._
    val schema = spark.read.parquet(path).schema
    val (kept, _) = manifestKeptFilesMulti(spark, path, bands)
    val base =
      if (kept.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      else spark.read.schema(schema).parquet(kept: _*)
    bands.foldLeft(base) { case (df, (keyCol, lo, hi)) =>
      val dt = schema(keyCol).dataType
      df.filter(col(keyCol) >= lit(lo).cast(dt) && col(keyCol) <= lit(hi).cast(dt))
    }
  }
}
