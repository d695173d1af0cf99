package graft.sources

import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}

/** Local filesystem with a per-file-open latency knob — scheme `slow://`.
  *
  * The zone-map manifest's durable result is the fraction of FILE OPENS
  * that never happen, but at local page-cache-resident sizes an open is
  * ~free, so wall-clock measurements show parity
  * ([[graft.tools.ManifestBenefit]]'s honest caveat) while the claim that
  * matters lives at object-store GET latency (10-50 ms each, ~800 k files
  * at 100 TB). This FS makes that term measurable on the local box: every
  * `open()` sleeps [[LatencyFileSystem.latencyMs]] and bumps a counter,
  * and everything else delegates to the local filesystem — so a scan
  * through `slow:///path` pays exactly one simulated GET per parquet
  * open (footer and data opens both, matching how an object store is
  * actually hit).
  *
  * Register: `spark.hadoop.fs.slow.impl = graft.sources.LatencyFileSystem`
  * (plus `fs.slow.impl.disable.cache=true` is NOT needed — the knob is a
  * static, read at each open, single-JVM local mode). Test-harness
  * machinery, not a production path.
  */
class LatencyFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "slow"
  override def getUri: java.net.URI = java.net.URI.create("slow:///")
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val ms = LatencyFileSystem.latencyMs
    if (ms > 0) Thread.sleep(ms)
    LatencyFileSystem.opens.incrementAndGet(): Unit
    super.open(f, bufferSize)
  }
}

object LatencyFileSystem {
  /** Simulated per-open GET latency; mutable test knob. */
  @volatile var latencyMs: Long = 0L
  val opens = new java.util.concurrent.atomic.AtomicLong()
}
