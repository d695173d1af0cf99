package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming surface (SURVEY.md §2.10 — an extension; the reference is
  * batch-only and gets its incremental semantics from the anti-join upsert).
  *
  * Each operator has (a) a batch form usable on any DataFrame — also the
  * oracle-testable form — and (b) a Structured Streaming form with
  * watermarks for unbounded input. Both share the same column logic.
  */
object Streams {

  /** Tumbling event-time window aggregate (batch + streaming: `window()`
    * works identically on both). Output: window start, event_type, count,
    * order-independent sum of value.
    */
  def tumblingCounts(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4))).cast("double").as("sum_value"))
      .select(
        col("w.start").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding event-time window counts (width > slide ⇒ each event lands in
    * width/slide windows — `window()` does the fan-out; epoch-aligned
    * starts, identical batch/stream semantics).
    */
  def slidingCounts(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))

  /** Streaming form of [[slidingCounts]] with a late-data watermark. */
  def slidingCountsStream(events: DataFrame, width: String, slide: String,
      watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))

  /** Windowed distinct-cardinality via a mergeable HLL sketch: per
    * tumbling event-time window, the estimated distinct `user_id` count.
    * THE streaming cardinality pattern — per-window state is one
    * 2^lgK-register sketch (a few KB) regardless of how many distinct
    * actors the window sees, where an exact `countDistinct` would hold a
    * per-user set per open window (and is rejected outright by Spark in
    * streaming aggregations). Batch and stream forms share semantics;
    * estimates are deterministic (fixed sketch seed) but approximate, so
    * the catalog head is pinned with an oracle-checked band companion
    * (q98 convention). At the test corpus's per-window cardinalities the
    * sketch stays in exact coupon mode.
    */
  def windowedDistinctUsers(events: DataFrame, width: String,
      lgK: Int = 12): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(lgK)))
        .as("est_users"))
      .select(col("w.start").as("win_start"), col("est_users"))

  /** Streaming form of [[windowedDistinctUsers]]: same sketch aggregate
    * under a late-data watermark — Spark keeps one partial sketch per
    * open window and evicts it when the watermark passes.
    */
  def windowedDistinctUsersStream(events: DataFrame, width: String,
      watermark: String, lgK: Int = 12): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(lgK)))
        .as("est_users"))
      .select(col("w.start").as("win_start"), col("est_users"))

  /** Streaming form with a watermark for state eviction of late data. */
  def tumblingCountsStream(events: DataFrame, width: String, watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))

  /** Batch sessionization: gap-based sessions per user via lag + running
    * conditional sum. Deterministic ordering includes event_id tie-break.
    * At scale this is one shuffle on user_id (window partition).
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val gapSec = gapMinutes * 60L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > gapSec, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_seq").cast("int").as("session_seq"),
        col("session_start"), col("session_end"), col("n_events"))
  }

  /** Declarative gap sessions via native `session_window` — works on both
    * batch frames and streams; the streaming form needs the watermark so
    * closed sessions can be finalized and their state evicted (a session
    * emits once the watermark passes its end). The third sessionization
    * form beside [[sessionizeBatch]] (window functions, exposes per-event
    * rows) and [[sessionizeStream]] (custom state, exposes timeout
    * control); this one is the idiomatic Spark shape — the engine merges
    * overlapping [ts, ts+gap) windows itself, batch and stream share the
    * exact same plan fragment.
    */
  def sessionWindowAgg(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("sw.start").as("session_start"), col("sw.end").as("session_end"),
        col("n_events"))

  /** Streaming form of [[sessionWindowAgg]]: watermark bounds session state. */
  def sessionWindowStream(events: DataFrame, gap: String, watermark: String): DataFrame =
    sessionWindowAgg(events.withWatermark("ts", watermark), gap)

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, session_start: java.sql.Timestamp, n_events: Long)

  /** Streaming sessionization with explicit state: flatMapGroupsWithState
    * emits a session when the gap timeout fires. The custom-state analog of
    * sessionizeBatch for unbounded input.
    */
  def sessionizeStream(spark: SparkSession, events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    // EventTimeTimeout requires an event-time watermark on the input; the
    // watermark also bounds how late a session can reopen.
    events.withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, new java.sql.Timestamp(s.start), s.n))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var out = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  out ::= Session(user, new java.sql.Timestamp(s.start), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            out.reverseIterator
          }
      }
  }

  /** Incremental append dedup for streams — the reference's anti-join upsert
    * semantics ([function_app.py:302-315]) approximated in-stream: emit each
    * business key AT MOST ONCE within the watermark horizon
    * (`dropDuplicatesWithinWatermark` keeps per-key state only until the
    * watermark passes it). This is weaker than the batch anti-join contract:
    * a key that re-arrives after its state expired IS emitted again — true
    * end-to-end idempotence needs the sink-side merge ([[upsertSink]]),
    * which anti-joins each micro-batch against the target table.
    */
  def dedupedAppendStream(events: DataFrame, keyCols: Seq[String], watermark: String): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keyCols)

  /** Interval join, batch form (extension; also the oracle-testable form):
    * each left row matches right rows with the same `key` whose timestamp
    * lies in [left.ts - before, left.ts + after]. Right columns come back
    * `r_`-prefixed. One equi-shuffle on the key; the time predicate is a
    * post-join filter band, not a cross join.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      before: String, after: String,
      tsLeft: String = "ts", tsRight: String = "ts",
      joinType: String = "inner"): DataFrame = {
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
    left.join(r,
      col(key) === col(s"r_$key") &&
        col(s"r_$tsRight") >= col(tsLeft) - expr(s"INTERVAL $before") &&
        col(s"r_$tsRight") <= col(tsLeft) + expr(s"INTERVAL $after"),
      joinType)
  }

  /** Stream-stream form of [[intervalJoin]]: BOTH sides carry watermarks —
    * mandatory for stream-stream joins, since the time bound plus the
    * watermarks is what lets Spark evict buffered join state (state is
    * bounded by watermark + interval width, not by stream length).
    *
    * `joinType` extends the semantics to outer variants: with
    * `"left_outer"` an unmatched left row is emitted null-padded — but
    * only once the watermark has passed its match interval, since until
    * then a matching right row could still arrive. (Inner results stream
    * out immediately; outer-null results are inherently watermark-delayed.
    * That is Spark's contract for outer stream-stream joins, and exactly
    * the behavior a "clicks without a purchase within the hour" feed
    * needs.) `"left_semi"` emits each left row at most once on first
    * match.
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
      watermark: String, before: String, after: String,
      tsLeft: String = "ts", tsRight: String = "ts",
      joinType: String = "inner"): DataFrame =
    intervalJoin(
      left.withWatermark(tsLeft, watermark),
      right.withWatermark(tsRight, watermark),
      key, before, after, tsLeft, tsRight, joinType)

  /** Stream-static enrichment (J1/J5 carried to streaming): every
    * micro-batch hash-joins against the broadcast dimension — the static
    * side is re-resolved per batch, so slowly-changing dims pick up
    * updates without restarting the query.
    */
  def enrichStream(stream: DataFrame, dim: DataFrame, cond: org.apache.spark.sql.Column, how: String = "left"): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), cond, how)

  /** A directory counts as a COMMITTED index table only when it holds at
    * least one visible (non-underscore, non-dot) entry: a crash during
    * the bootstrap write can leave the directory present with only the
    * committer's `_temporary` inside, and keying bootstrap-vs-ingest on
    * bare `exists()` would then take the ingest path forever — loud
    * (readPqCodebooks/readIvfCentroids fail) but permanently wedged until
    * someone deletes the directory by hand. Under the v1 file committer
    * task outputs stay under `_temporary` until job commit, so a visible
    * entry means the job committed.
    */
  private def committedDir(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Streaming sink with the reference's K1/K2 upsert semantics: each
    * micro-batch runs the same anti-join insert-only merge the batch
    * pipeline uses ([[graft.operators.Upsert.upsertParquet]]), so a
    * restarted/replayed stream never duplicates a business key — the
    * streaming and batch sinks share one code path and one idempotence
    * contract.
    */
  def upsertSink(
      df: DataFrame,
      targetPath: String,
      keys: Seq[String],
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Upsert.upsertParquet(
          batch.sparkSession, batch.toDF(), targetPath, keys): Unit
      }
      .start()

  /** Streaming dedup-preserving ingest: each micro-batch appends ONLY the
    * rows whose content hash is new — new to the stored corpus AND to the
    * batch itself ([[graft.ext.Dedup.dedupIngest]]'s accept-list, with the
    * accepted rows' full payloads joined back by id). The target therefore
    * stays exactly-deduplicated under continuous arrival, and a replayed
    * micro-batch (restart, retry) is a no-op because its hashes are
    * already stored — the same idempotence contract as [[upsertSink]],
    * keyed by CONTENT instead of business key.
    */
  def dedupIngestSink(
      df: DataFrame,
      targetPath: String,
      idCol: String,
      textCol: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val b = batch.toDF()
        val existing =
          try spark.read.parquet(targetPath)
          catch { case _: org.apache.spark.sql.AnalysisException =>
            spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), b.schema) }
        // join on (id, content hash), not id alone: an at-least-once source
        // can deliver duplicate ids in one batch, and an id-only join would
        // fan the accept-list out and write duplicate content — the exact
        // invariant this sink exists to hold. dropDuplicates collapses
        // identical redelivered rows deterministically (payloads equal).
        val accepted = graft.ext.Dedup.dedupIngest(existing, b, idCol, textCol)
          .select(col(idCol), col("content_hash").as("__ch"))
        b.withColumn("__ch", md5(col(textCol).cast("binary")))
          .join(accepted, Seq(idCol, "__ch"))
          .dropDuplicates(idCol, "__ch")
          .drop("__ch")
          .write.mode("append").parquet(targetPath)
        graft.sources.Tables.maintainManifest(spark, targetPath): Unit
      }
      .start()

  /** Streaming NEAR-dup-preserving ingest: each micro-batch appends only
    * the rows that are neither exact duplicates (content hash new to the
    * store and unique in the batch — [[dedupIngestSink]]'s contract) nor
    * near-duplicates of any STORED document: no banded-minhash pair at
    * `threshold` word-shingle Jaccard against the store, every candidate
    * verified by exact set intersection ([[graft.ext.Dedup
    * .minhashLshPairsIncremental]] — the batch pays |batch| signature
    * passes plus one equi-join against the store's band index, never a
    * batch × store comparison).
    *
    * Idempotence (replay after a restart): an accepted row is an EXACT
    * duplicate of itself in the store when the replay arrives, so the
    * exact stage drops it; a rejected row stays rejected (its exact or
    * near blocker is still stored). Within-batch NEAR-dups (distinct
    * texts) are both accepted — cross-pairs-only is the incremental
    * operator's documented contract, matching [[semanticIngestSink]];
    * run [[graft.ext.Dedup.minhashLshPairs]] + connectedComponents on the
    * batch first where intra-batch near-dedup matters.
    */
  def nearDedupIngestSink(
      df: DataFrame,
      targetPath: String,
      idCol: String,
      textCol: String,
      checkpointDir: String,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val b = batch.toDF()
        val existing =
          try spark.read.parquet(targetPath)
          catch { case _: org.apache.spark.sql.AnalysisException =>
            spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), b.schema) }
        // stage 1 — exact: (id, content-hash) join so duplicate ids from an
        // at-least-once source cannot fan the accept-list out (the
        // dedupIngestSink rule)
        val exactAccepted = graft.ext.Dedup.dedupIngest(existing, b, idCol, textCol)
          .select(col(idCol), col("content_hash").as("__ch"))
        val exactKept = b.withColumn("__ch", md5(col(textCol).cast("binary")))
          .join(exactAccepted, Seq(idCol, "__ch"))
          .dropDuplicates(idCol, "__ch")
          .drop("__ch")
        // stage 2 — near: drop survivors with a verified stored partner
        val nearBlocked = graft.ext.Dedup.minhashLshPairsIncremental(
            existing, exactKept, idCol, textCol, n, numHashes, bands, threshold)
          .select(col("incoming_id").as(idCol)).distinct()
        exactKept.join(nearBlocked, Seq(idCol), "left_anti")
          .write.mode("append").parquet(targetPath)
        graft.sources.Tables.maintainManifest(spark, targetPath): Unit
      }
      .start()

  /** Streaming near-dup ingest AGAINST THE PERSISTED INDEX — the crawl-
    * cadence form of [[nearDedupIngestSink]]. That sink re-reads the store
    * and re-derives its band index every micro-batch (O(|store|) per
    * batch); this one keeps the [[graft.ext.Dedup.buildDedupIndex]]
    * tables plus an exact-dup `hashes/` table NEXT TO the store and pays
    * O(|batch|) per batch: exact stage = content-hash anti-join against
    * `hashes/`, near stage = [[graft.ext.Dedup.minhashLshPairsAgainstIndex]],
    * accepted rows land in the store under a `batch_id=` partition and
    * are ingested into the index ([[graft.ext.Dedup.dedupIndexIngest]]).
    *
    * Idempotence (replay after restart): the store write is a
    * deterministic per-batch dynamic partition overwrite (the [[cmsSink]]
    * rule) — a replayed batch overwrites its own partition, never
    * duplicates store rows; the batch's survivor-per-duplicate-text choice
    * is a deterministic min-id argmin so a replay recomputes the same
    * accept set. Index appends DO replay as duplicate rows, which every
    * probe tolerates by construction (distinct/dropDuplicates on read) and
    * [[graft.ext.Dedup.dedupIndexCompact]] removes. Bootstrap: the first
    * non-empty batch builds the index; pre-existing plain stores should be
    * indexed once with `buildDedupIndex` (plus a `hashes/` backfill of
    * `md5(text)`) before attaching the sink. Crash recovery: `sets/` and
    * `hashes/` are gated INDEPENDENTLY (hashes/ lands last in a batch), so
    * a crash that leaves the index half-written replays cleanly — the
    * replayed batch's texts are already in the near-dup index and block
    * themselves at jaccard 1, and the store overwrite is per-partition
    * idempotent either way.
    */
  def indexedNearDedupIngestSink(
      df: DataFrame,
      targetPath: String,
      indexDir: String,
      idCol: String,
      textCol: String,
      checkpointDir: String,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.toDF()
        val fs = new org.apache.hadoop.fs.Path(indexDir)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val hasIndex = committedDir(fs, s"$indexDir/sets")
        // gated SEPARATELY from sets/: hashes/ is written LAST in the
        // batch, so a crash between the index build and the hashes append
        // leaves sets/ present with hashes/ missing — keying the exact
        // anti-join on sets/ would make the replay throw PATH_NOT_FOUND
        // forever (the batch would wedge, contradicting replay-idempotence)
        val hasHashes = committedDir(fs, s"$indexDir/hashes")
        // one survivor per distinct text, chosen deterministically (min id):
        // at-least-once sources repeat rows, and two batch rows with the
        // same text are exact dups of each other
        val hashed = b
          .withColumn("__ch", md5(col(textCol).cast("binary")))
          .groupBy("__ch")
          .agg(min_by(struct(b.columns.map(col): _*), col(idCol)).as("__r"))
          .select(col("__ch"), col("__r.*"))
        val exactKept =
          if (!hasHashes) hashed
          else hashed.join(
            spark.read.parquet(s"$indexDir/hashes").select(col("ch").as("__ch")),
            Seq("__ch"), "left_anti")
        val nearBlockedIds =
          if (!hasIndex) exactKept.limit(0).select(col(idCol))
          else graft.ext.Dedup.minhashLshPairsAgainstIndex(spark, indexDir,
              exactKept.drop("__ch"), idCol, textCol, n, numHashes, bands, threshold)
            .select(col("incoming_id").as(idCol)).distinct()
        // one evaluation feeds the store write and all four index appends
        val accepted = exactKept.join(nearBlockedIds, Seq(idCol), "left_anti")
          .localCheckpoint()
        if (!accepted.isEmpty) {
          accepted.drop("__ch").withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(targetPath)
          graft.sources.Tables.maintainManifest(spark, targetPath): Unit
          if (hasIndex)
            graft.ext.Dedup.dedupIndexIngest(accepted.drop("__ch"), idCol,
              textCol, indexDir, n, numHashes, bands)
          else
            graft.ext.Dedup.buildDedupIndex(accepted.drop("__ch"), idCol,
              textCol, indexDir, n, numHashes, bands)
          accepted.select(col("__ch").as("ch"))
            .write.mode("append").parquet(s"$indexDir/hashes"): Unit
        }
      }
      .start()

  /** Streaming semantic-dedup ingest: the embedding-side member of the
    * ingest-sink triple (business-key [[upsertSink]], content-hash
    * [[dedupIngestSink]], semantic — this). Each micro-batch appends only
    * the vectors [[graft.ext.Similarity.semanticIngest]] accepts: no
    * stored vector in the incoming vector's quantizer cell reaches
    * `threshold` exact cosine.
    *
    * Quantizer policy — STORE-OWNED, REFIT PER BATCH: the cell centroids
    * are fit on the CURRENT store at the start of every micro-batch (the
    * bounded hash-spread `fitSample` collect + driver k-means of the batch
    * operator, with the shared auto-nlist rule), never on the batch. The
    * batch therefore cannot steer the quantizer it is judged by, the
    * store's cell structure tracks its own drift as it grows, and a batch
    * is always compared under one consistent quantizer — at the cost of
    * one bounded fit per batch, the price of cell assignments staying
    * fresh without a separate model-maintenance job.
    *
    * Idempotence (replay a micro-batch after a restart): an accepted row's
    * vector is in the store when the replay arrives, blocks its duplicate
    * at cosine exactly 1 ≥ threshold, and the replay appends nothing; a
    * rejected row stays rejected (its blocker is still stored). Identical
    * redelivered (id, vector) rows within one batch collapse before the
    * ingest so the accept-list join cannot fan out. Within-batch NEAR-dups
    * (distinct vectors) are both accepted — cross-pairs-only is the batch
    * operator's documented contract; run [[graft.ext.Similarity
    * .semanticDedupAuto]] on the batch first where that matters.
    */
  def semanticIngestSink(
      df: DataFrame,
      targetPath: String,
      idCol: String,
      vecCol: String,
      threshold: Double,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val b = batch.toDF().dropDuplicates(idCol, vecCol)
        val existing =
          try spark.read.parquet(targetPath)
          catch { case _: org.apache.spark.sql.AnalysisException =>
            spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), b.schema) }
        val accepted = graft.ext.Similarity
          .semanticIngest(existing, b, idCol, vecCol, threshold)
          .filter(col("accept"))
          .select(col(idCol))
        b.join(accepted, Seq(idCol), "left_semi")
          .write.mode("append").parquet(targetPath)
        graft.sources.Tables.maintainManifest(spark, targetPath): Unit
      }
      .start()

  /** Streaming semantic ingest AGAINST THE PERSISTED IVF INDEX — the
    * crawl-cadence form of [[semanticIngestSink]], completing the pair
    * with [[indexedNearDedupIngestSink]]. The refit-per-batch sink reads
    * the whole store and fits a fresh quantizer every micro-batch
    * (O(|store|)); this one keeps a [[graft.ext.Similarity.buildIvfIndex]]
    * index next to the store: per batch one bounded centroid read, a
    * cell-pruned probe ([[graft.ext.Similarity.semanticIngestAgainstIndex]]),
    * a `batch_id=`-partitioned dynamic-overwrite store write
    * (replay-idempotent), and an index append
    * ([[graft.ext.Similarity.ivfIndexIngest]]) whose replayed duplicate
    * rows are probe-tolerated and removed by
    * [[graft.ext.Similarity.ivfIndexCompact]]. The quantizer is FROZEN at
    * bootstrap (first non-empty batch fits it) rather than refit per
    * batch — the documented IVF drift trade-off; rebuild the index when
    * the recall audit says so.
    */
  def indexedSemanticIngestSink(
      df: DataFrame,
      targetPath: String,
      indexDir: String,
      idCol: String,
      vecCol: String,
      threshold: Double,
      checkpointDir: String,
      nlist: Int = 16): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.toDF().dropDuplicates(idCol, vecCol)
        val fs = new org.apache.hadoop.fs.Path(indexDir)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val hasIndex = committedDir(fs, s"$indexDir/centroids")
        val accepted = (if (!hasIndex) b
          else {
            val acc = graft.ext.Similarity.semanticIngestAgainstIndex(
                spark, indexDir, b, idCol, vecCol, threshold)
              .filter(col("accept")).select(col(idCol))
            b.join(acc, Seq(idCol), "left_semi")
          }).localCheckpoint()
        if (!accepted.isEmpty) {
          accepted.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(targetPath)
          graft.sources.Tables.maintainManifest(spark, targetPath): Unit
          if (hasIndex)
            graft.ext.Similarity.ivfIndexIngest(spark, indexDir, accepted,
              idCol, vecCol)
          else
            graft.ext.Similarity.buildIvfIndex(accepted, idCol, vecCol,
              indexDir, nlist): Unit
        }
      }
      .start()

  /** Streaming crawl ingest gated by the persisted SIGNATURE index — the
    * third indexed crawl sink (text MinHash:
    * [[indexedNearDedupIngestSink]], vectors:
    * [[indexedSemanticIngestSink]], 64-bit perceptual signatures: this).
    * The stream carries `(idCol, sigCol)` rows — signatures computed
    * upstream by whichever family applies (image dHash, audio
    * fingerprint, text SimHash); the sink is family-agnostic because the
    * blocking is. Per micro-batch: one bucket-pruned probe
    * ([[graft.ext.Dedup.signatureIndexProbe]] — O(|batch| + matched
    * buckets), store size never scanned), rows within `maxHamming` of a
    * stored signature are dropped, survivors land in a
    * `batch_id=`-partitioned dynamic-overwrite store (replay-idempotent)
    * and append into the index
    * ([[graft.ext.Dedup.signatureIndexIngest]]); replayed appends are
    * probe-tolerated duplicates removed by
    * [[graft.ext.Dedup.signatureIndexCompact]].
    */
  def indexedSignatureIngestSink(
      df: DataFrame,
      targetPath: String,
      indexDir: String,
      idCol: String,
      sigCol: String,
      checkpointDir: String,
      maxHamming: Int = 3): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // at-least-once sources repeat rows; min-id survivor per distinct
        // signature (two batch rows within the ball of the same stored
        // signature are near-dups of each other too, but the contract is
        // the indexed gate — intra-batch near-dups resolve on the NEXT
        // batch once the survivor is indexed, the crawl-cadence trade
        // every indexed sink here makes)
        val b = batch.toDF()
          .groupBy(col(sigCol))
          .agg(min(col(idCol)).as(idCol))
          .select(col(idCol), col(sigCol))
        def asSig(df: DataFrame): DataFrame =
          df.select(col(idCol).as("id"), col(sigCol).as("sig"))
        val fs = new org.apache.hadoop.fs.Path(indexDir)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val hasIndex = committedDir(fs, s"$indexDir/sigs")
        val accepted = (if (!hasIndex) b
          else {
            val blocked = graft.ext.Dedup.signatureIndexProbe(
                spark, indexDir, asSig(b), maxHamming)
              .select(col("incoming_id").as(idCol)).distinct()
            b.join(blocked, Seq(idCol), "left_anti")
          }).localCheckpoint()
        if (!accepted.isEmpty) {
          accepted.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(targetPath)
          graft.sources.Tables.maintainManifest(spark, targetPath): Unit
          if (hasIndex)
            graft.ext.Dedup.signatureIndexIngest(spark, indexDir, asSig(accepted))
          else graft.ext.Dedup.buildSignatureIndex(asSig(accepted), indexDir)
        }
      }
      .start()

  /** Streaming CLUSTER-ASSIGNMENT maintenance — the fourth indexed crawl
    * sink: where [[indexedSignatureIngestSink]] drops near-dups at the
    * gate, this one keeps every row and maintains the persisted
    * connected-components assignment
    * ([[graft.ext.Dedup.componentsIngest]]) so "which cluster is this
    * document in?" is a table read at any moment, never a corpus-scale CC
    * re-run by the CALLER. Per micro-batch the ingest dispatches on the
    * stored-signature count (a footer-metadata pre-flight): small stores
    * re-cluster outright (measured cheaper below the
    * [[graft.ext.Dedup.SIG_CC_RECOMPUTE_BELOW]] crossover), large ones
    * run the O(|batch|) union-find (batch-class CC, one bucket-pruned
    * probe, CC on the contracted rep graph, two slim appends).
    * Bootstrap is gated on `merges/`, the LAST table
    * [[graft.ext.Dedup.buildComponentsIndex]] writes, so a crash mid-build
    * re-runs the (overwrite-mode, idempotent) build instead of wedging on
    * a half-present index; replayed ingests append bit-identical rows,
    * deduped at read and by [[graft.ext.Dedup.componentsIndexCompact]].
    */
  def indexedComponentsIngestSink(
      df: DataFrame,
      indexDir: String,
      idCol: String,
      sigCol: String,
      checkpointDir: String,
      maxHamming: Int = 3): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        // at-least-once sources repeat rows within a batch
        val b = batch.toDF()
          .select(col(idCol).as("id"), col(sigCol).as("sig"))
          .dropDuplicates("id")
        val fs = new org.apache.hadoop.fs.Path(indexDir)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val bootstrapped = committedDir(fs, s"$indexDir/merges")
        if (!bootstrapped) graft.ext.Dedup.buildComponentsIndex(b, indexDir, maxHamming)
        else graft.ext.Dedup.componentsIngest(spark, b, indexDir, maxHamming)
      }
      .start()

  /** Streaming distribution-drift monitor — the q152 event-mix entropy on
    * a live stream: per event-time window, the Shannon entropy of the
    * event-type distribution (6-dp decimal terms, the batch operator's
    * exact discipline). Structured Streaming allows ONE stateful
    * aggregation per query, so the window × type counts are the streaming
    * stage (watermark-evicted, append mode — a window emits once, when
    * the watermark passes it) and the entropy fold over those counts is
    * STATELESS within each micro-batch: by emission time a window's
    * counts are complete and arrive in one batch, so the fold never needs
    * cross-batch state. Results land via dynamic partition overwrite
    * keyed by window start — a replayed micro-batch (restart, retry)
    * rewrites its own windows with identical values, making the sink
    * idempotent without a merge. The day-over-day delta (q152's lag) is
    * one window over the tiny written frame at read time; a lag inside
    * the stream would be a second stateful stage for no benefit.
    */
  def mixDriftSink(
      events: DataFrame,
      width: String,
      watermark: String,
      targetPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    tumblingCountsStream(events, width, watermark)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val e = batch.toDF()
          .groupBy(col("win_start"))
          .agg(sum(col("n")).as("n_events"),
            count(lit(1)).as("n_types"),
            sum(round(col("n").cast("double") * log(col("n").cast("double")), 6)
              .cast("decimal(18,6)")).as("__sclnc"))
          .select(col("win_start"), col("n_events"), col("n_types"),
            round(log(col("n_events").cast("double")) -
              col("__sclnc").cast("double") / col("n_events").cast("double"), 6)
              .as("entropy"))
        if (!e.isEmpty)
          e.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("win_start")
            .parquet(targetPath): Unit
      }
      .start()

  /** [[upsertSink]] with a JDBC target: each micro-batch runs
    * [[graft.sources.Jdbc.upsertJdbc]]'s anti-join insert-only merge, so a
    * replayed micro-batch (restart, retry) never duplicates a business key
    * in the database — the streaming, batch-parquet and batch-JDBC sinks
    * all share one idempotence contract.
    */
  def jdbcUpsertSink(
      df: DataFrame,
      url: String,
      table: String,
      keys: Seq[String],
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sources.Jdbc.upsertJdbc(batch.toDF(), url, table, keys): Unit
      }
      .start()

  /** Streaming maintenance of a materialized count-min sketch
    * ([[graft.ext.Cms]]): each micro-batch sketches its own keys (one
    * map-side-combining pass, ≤ depth×width counter rows however large
    * the batch) and lands them under a `batch_id=` partition via dynamic
    * partition overwrite. Counters are ADDITIVE, so the usual merge-sink
    * idempotence trick (anti-join on keys) cannot work — a replayed
    * batch would double-count. Partitioning by batch id restores the
    * contract: a replay rewrites ITS OWN partition with bit-identical
    * content (the sketch is deterministic), and the current sketch is
    * [[graft.ext.Cms.readMerged]] — a counter sum over the batch
    * partitions, each sketch-sized, so reading stays cheap until routine
    * compaction ([[graft.sources.Tables.compact]]) folds old batches.
    * This is the streaming twin of the batch sketch family: frequency
    * analytics over an unbounded stream from constant-size state per
    * batch, no raw-data rescans ever.
    */
  def cmsSink(
      stream: DataFrame,
      keyCol: String,
      targetPath: String,
      checkpointDir: String,
      depth: Int = 4,
      width: Int = 8192): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sk = graft.ext.Cms.sketch(batch.toDF(), keyCol, depth, width)
          .withColumn("batch_id", lit(batchId))
        if (!sk.isEmpty)
          sk.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(targetPath): Unit
      }
      .start()

  /** Streaming QUALITY GATE — score each micro-batch with a FROZEN
    * pre-fit [[graft.ext.Classifier.LogRegModel]] (train before the
    * stream starts; model drift is a redeploy, not a micro-batch
    * concern) and keep rows scoring ≥ `threshold`. Completely stateless:
    * one codegen'd scoring pass per batch, no index, no shuffle, and the
    * `batch_id`-partitioned dynamic overwrite makes replay trivially
    * idempotent — the same batch rescores to the same decisions. The
    * crawl-pipeline shape: langid/quality heuristics upstream, the
    * trained filter here, dedup sinks downstream.
    */
  def classifierGateSink(
      df: DataFrame,
      targetPath: String,
      model: graft.ext.Classifier.LogRegModel,
      textCol: String,
      checkpointDir: String,
      threshold: Double = 0.5): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        graft.functions.GraftFunctions.register(spark)
        val scored = batch.toDF()
          .withColumn("score",
            graft.ext.Classifier.scoreCol(col(textCol), model))
          .filter(col("score") >= threshold)
        if (!scored.isEmpty)
          scored.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(targetPath): Unit
      }
      .start()

  /** Streaming CHUNK-DEDUP ingest — the chunk-hash index
    * ([[graft.ext.TextAnalysis.chunkIndexIngest]]) at crawl cadence:
    * each micro-batch's documents are rewritten with every
    * already-admitted chunk removed (corpus-wide, then
    * earlier-in-batch), survivors land in the store and their chunk
    * hashes append to the index — O(|batch|) per batch, the corpus
    * never re-shuffles. Documents rewritten to EMPTY are dropped from
    * the store (the curation decision), which is also what makes replay
    * safe: a replayed batch finds all its chunks already admitted,
    * rewrites everything to empty, and writes nothing — the store keeps
    * the original batch's output. The admit is ATOMIC (one directory
    * rename, [[graft.ext.TextAnalysis.chunkIndexAdmit]]) with a
    * per-batch token, so a crash mid-admit cannot leave a partially
    * admitted hash set for the replay to probe against — the replay
    * sees all of the batch's hashes (skips both writes) or none
    * (repeats both identically). Bootstrap is gated on `chunks/`
    * existence, and the bootstrap build commits by the same rename
    * protocol; replayed hash admits are anti-join-tolerated duplicates
    * folded by [[graft.ext.TextAnalysis.chunkIndexCompact]].
    */
  def indexedChunkDedupIngestSink(
      df: DataFrame,
      targetPath: String,
      indexDir: String,
      idCol: String,
      textCol: String,
      checkpointDir: String,
      chunkSize: Int = 10): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // at-least-once sources repeat rows within a batch
        val b = batch.toDF().dropDuplicates(idCol)
        val fs = new org.apache.hadoop.fs.Path(indexDir)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val bootstrapped = fs.exists(
          new org.apache.hadoop.fs.Path(s"$indexDir/chunks"))
        // store BEFORE admit, in both branches: once hashes are admitted
        // a replayed batch rewrites itself to empty and skips the store
        // write, so admitting first + crashing before the store write
        // would lose the batch's content forever. With this order a
        // crash replays the same probe (hashes not yet admitted) into
        // the same dynamic-overwrite partition — idempotent.
        if (!bootstrapped) {
          val out = graft.ext.TextAnalysis
            .chunkDedupRewrite(b, idCol, textCol, chunkSize)
            .filter(col("n_kept") > 0).localCheckpoint()
          if (!out.isEmpty)
            out.withColumn("batch_id", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id")
              .parquet(targetPath)
          graft.ext.TextAnalysis.buildChunkIndex(b, idCol, textCol,
            chunkSize, indexDir)
        } else {
          val surviving = graft.ext.TextAnalysis
            .chunkIndexProbe(spark, indexDir, b, idCol, textCol, chunkSize)
            .localCheckpoint()
          val kept = graft.ext.TextAnalysis
            .chunkIndexRewrite(b, surviving, idCol, textCol, chunkSize)
            .filter(col("n_kept") > 0)
          if (!kept.isEmpty)
            kept.withColumn("batch_id", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id")
              .parquet(targetPath)
          // deterministic token → the admit commits by ONE directory
          // rename and a replayed admit is a no-op, so a crash anywhere
          // in this branch replays against either ALL of the batch's
          // admitted hashes (store already durable) or NONE (probe and
          // store write repeat identically) — never a partial set
          graft.ext.TextAnalysis.chunkIndexAdmit(surviving, indexDir,
            admitToken = s"batch$batchId")
        }
      }
      .start()

  /** Streaming ANN-index maintenance — the crawl-cadence feed of the
    * persisted PQ-codes index ([[graft.ext.Similarity.buildPqIndex]]),
    * completing the sink family: every persisted index (MinHash bands,
    * IVF cells, 64-bit signatures, connected components, chunk hashes,
    * PQ codes) now has an O(|batch|)-per-micro-batch ingest path. The
    * stream carries `(idCol, vecCol)` rows; per micro-batch the raw
    * vectors land in a `batch_id=`-partitioned dynamic-overwrite store
    * (replay-idempotent — and the float store IS the exact-rerank side
    * `pqIndexTopK(vectors = …)` wants), and the codes append via
    * [[graft.ext.Similarity.pqIndexIngest]] — encode against the FROZEN
    * codebooks, no re-fit, no corpus touch. The first non-empty batch
    * bootstraps the model ([[graft.ext.Similarity.buildPqIndex]], fit on
    * that batch — the frozen-quantizer trade of every indexed sink here;
    * [[graft.ext.Similarity.pqSinkRetrainCompact]] is the repair when the
    * bootstrap batch proves unrepresentative). A replayed batch appends
    * bit-identical code rows — tolerated at probe AS DUPLICATE NEIGHBOR
    * ROWS (the same id can occupy two top-k slots) until
    * [[graft.ext.Similarity.pqIndexCompact]] folds them — the
    * [[indexedSemanticIngestSink]] contract. Unlike the GATING sinks this
    * one indexes every row it is handed: the same id arriving in two
    * DIFFERENT batches is two store rows and two code rows by design —
    * feed it from a deduplicating stage ([[dedupIngestSink]] or an
    * upstream `dropDuplicates` with state) when ids can recur across
    * batches.
    */
  def indexedPqIngestSink(
      df: DataFrame,
      targetPath: String,
      indexDir: String,
      idCol: String,
      vecCol: String,
      checkpointDir: String,
      m: Int = 16,
      ksub: Int = 64): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // at-least-once sources repeat rows within a batch
        val b = batch.toDF().dropDuplicates(idCol).localCheckpoint()
        if (!b.isEmpty) {
          // store BEFORE index append: a crash between the two replays
          // into the same dynamic-overwrite partition (idempotent) and
          // re-appends — a duplicate code row, compact's job — while the
          // reverse order could leave codes pointing at vectors the
          // store never received
          b.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(targetPath)
          graft.sources.Tables.maintainManifest(spark, targetPath): Unit
          val fs = new org.apache.hadoop.fs.Path(indexDir)
            .getFileSystem(spark.sessionState.newHadoopConf())
          // committedDir, not exists(): a crash during the bootstrap
          // commit leaves codebooks/ present with no committed part file,
          // and keying on bare existence would send every replay down the
          // ingest path into readPqCodebooks' failure forever — an
          // uncommitted model directory is NO index, so the replay
          // re-bootstraps (overwrite mode, idempotent)
          val hasIndex = committedDir(fs, s"$indexDir/codebooks")
          if (hasIndex)
            graft.ext.Similarity.pqIndexIngest(spark, indexDir, b, idCol, vecCol)
          else
            graft.ext.Similarity.buildPqIndex(b, idCol, vecCol, indexDir,
              m = m, ksub = ksub)
        }
      }
      .start()
}
