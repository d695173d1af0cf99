package graft.ext

import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem lease enforcing the compaction/ingest mutual exclusion the
  * index families previously carried only as a scaladoc contract: a
  * compactor that runs concurrently with an appender silently drops the
  * appender's rows (the append lands between the compactor's read and
  * its [[Dedup.swapIn]] swap and vanishes with the old directory).
  *
  * Protocol:
  *  - Every compactor wraps its read-rewrite-swap in [[withLease]]: a
  *    create-exclusive marker file `_compact_lease` at the index root.
  *    A second concurrent compactor fails loudly. A lease older than
  *    `staleLeaseMs` (a crashed compactor) is broken and re-acquired.
  *  - Every ingest append wraps its writes in [[guardedAppend]]: the
  *    lease is checked BEFORE the append (fail fast — compaction in
  *    progress, nothing written) and re-checked AFTER it (a compactor
  *    that acquired mid-append may have read the table before this
  *    append's files landed; its swap would drop them — the post-check
  *    turns that silent loss into a loud error naming the recovery:
  *    re-run the append after compaction finishes, the index convention
  *    of replay-tolerated duplicates makes the retry safe).
  *
  * The residual race — an append that finishes in the instant between
  * the compactor's lease release and the post-check — is benign: the
  * swap has already happened, so the append landed on the NEW directory
  * and survives. The checks are single filesystem metadata calls per
  * append (no Spark jobs), so crawl-cadence sinks pay nothing
  * measurable.
  */
object CompactionLease {

  /** Crashed-compactor recovery horizon: a lease untouched for this long
    * is considered abandoned and broken by the next acquirer. Generous
    * next to any measured compaction (seconds at sf10); configurable per
    * call for specs.
    */
  val DefaultStaleLeaseMs: Long = 60L * 60 * 1000

  class CompactionInProgressException(msg: String)
    extends IllegalStateException(msg)

  private def leasePath(indexDir: String) = new Path(indexDir, "_compact_lease")

  private def fsOf(spark: SparkSession, indexDir: String) =
    new Path(indexDir).getFileSystem(spark.sessionState.newHadoopConf())

  // lease path -> holder thread id, for re-entrancy: a leased compactor
  // may call the same append primitives an external ingest uses (e.g.
  // the dispatch recompute's sigs append); its OWN thread passes the
  // checks, any other thread/process still fails loudly
  private val heldBy =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Run `body` (a compactor's read-rewrite-swap) under the exclusive
    * lease; always released on exit, including failure (a crashed JVM
    * instead ages into the stale-lease horizon).
    */
  def withLease[T](spark: SparkSession, indexDir: String,
      staleLeaseMs: Long = DefaultStaleLeaseMs)(body: => T): T = {
    val fs = fsOf(spark, indexDir)
    val lease = leasePath(indexDir)
    fs.mkdirs(new Path(indexDir)): Unit
    if (fs.exists(lease) &&
        fs.getFileStatus(lease).getModificationTime <
          System.currentTimeMillis() - staleLeaseMs)
      fs.delete(lease, false): Unit // abandoned by a crashed compactor
    try fs.create(lease, false).close()
    catch {
      case _: FileAlreadyExistsException | _: java.io.IOException
          if fs.exists(lease) =>
        throw new CompactionInProgressException(
          s"compaction lease already held at $lease — a compactor is " +
            "running (or crashed within the stale horizon); only one " +
            "compaction may run per index")
    }
    heldBy.put(lease.toString, Thread.currentThread().getId)
    try body
    finally {
      heldBy.remove(lease.toString): Unit
      fs.delete(lease, false): Unit
    }
  }

  /** Fail loudly if a (fresh) compaction lease is held. */
  def checkClear(spark: SparkSession, indexDir: String, phase: String,
      staleLeaseMs: Long = DefaultStaleLeaseMs): Unit = {
    val fs = fsOf(spark, indexDir)
    val lease = leasePath(indexDir)
    val holder = heldBy.get(lease.toString)
    if (holder != null && holder.longValue == Thread.currentThread().getId)
      return // our own compaction invoking an append primitive
    if (fs.exists(lease) &&
        fs.getFileStatus(lease).getModificationTime >=
          System.currentTimeMillis() - staleLeaseMs)
      throw new CompactionInProgressException(
        s"index at $indexDir is being compacted ($phase): " +
          (if (phase == "before append")
            "nothing was written — retry after compaction finishes."
          else
            "rows appended during the compaction window may be dropped " +
              "by its swap — RE-RUN this append after compaction " +
              "finishes (replayed appends are tolerated duplicates)."))
  }

  /** Wrap an ingest append: pre-check (fail fast, nothing written) and
    * post-check (turn the concurrent-compaction drop into a loud,
    * recoverable error).
    */
  def guardedAppend[T](spark: SparkSession, indexDir: String)(body: => T): T = {
    checkClear(spark, indexDir, "before append")
    val out = body
    checkClear(spark, indexDir, "after append")
    out
  }
}
