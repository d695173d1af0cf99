package graft

import org.apache.spark.sql.SparkSession

/** The blessed SparkSession configuration for graft workloads — the one
  * switch a user of this library flips to get the engine's contract:
  *
  *  - `graft.functions.GraftExtensions` injected, so every `graft_*`
  *    function resolves from SQL as well as the DataFrame API;
  *  - AQE with skew-join splitting on (the runtime half of the skew story;
  *    [[graft.operators.Joins.saltedJoin]] is the explicit half);
  *  - UTC session time zone and TIMESTAMP_MICROS parquet output — the
  *    cross-engine comparability contract every oracle check relies on;
  *  - `nanosAsLong` so TIMESTAMP(NANOS) parquet (the `events` table) loads
  *    instead of failing ([[graft.sources.Tables.load]] converts to NTZ).
  *
  * Cluster-size knobs (master, shuffle partitions) stay caller-owned: on a
  * real cluster you want shuffle partitions sized to executors × cores (or
  * left to AQE coalescing), not a library default. What the builder DOES
  * own is the AQE partition-sizing posture: shuffles START at a high
  * initial partition count and AQE coalesces them down to the advisory
  * size at runtime — so a small shuffle still collapses to a handful of
  * tasks, while a corpus-scale gram/pair shuffle keeps enough partitions
  * to stay under the external-sort spill threshold. (The fixed-32 floor
  * this replaces put ~30 M rows per task on the 100× replica; re-running
  * the pair/gram family at 256 initial partitions measured −24 % to −62 %
  * wall — the BASELINE.md round-9 partition-sizing experiment, now the
  * default instead of an env override.)
  */
object Session {
  /** Initial (pre-coalesce) shuffle partition count: max(256, 8×cores) —
    * 256 is the measured sf10 sweet spot on 32 cores; a bigger machine
    * scales it linearly. AQE's coalescing makes over-provisioning cheap
    * (small shuffles merge back to a few tasks); under-provisioning is
    * the expensive direction (spill).
    */
  def initialShufflePartitions(cores: Int): Int = math.max(256, cores * 8)

  def builder(
      appName: String = "graft",
      master: Option[String] = None,
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // File listing of the engine's hive-bucketed index layouts (comps/
      // 64 dirs, sigs/ 256-8192, IVF/PQ cells): the default threshold (32
      // paths) turns EVERY read of such a store into a distributed
      // listing job — one scheduler round-trip per spark.read on the
      // lifecycle hot paths (measured ~60-110 ms each, 5-9 per lifecycle
      // entry). Driver-side listing of up to 1024 directories is cheaper
      // than a job dispatch on any filesystem; stores wider than that
      // (the 8192-bucket wide layout at the billion-row decade) still get
      // the distributed listing.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
    val withMaster = master.fold(b)(b.master)
    shufflePartitions.fold(withMaster)(n =>
      withMaster
        // n is the non-AQE fallback AND the coalesce parallelism floor;
        // the initial count is where AQE starts before coalescing
        .config("spark.sql.shuffle.partitions", n.toString)
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
          initialShufflePartitions(n).toString))
  }

  /** Local session for tests/tools: `local[cpus]` with the AQE
    * initial-count/coalesce posture above (fallback parallelism = cpus)
    * and no UI. `SPARK_GRAFT_SHUFFLE` still overrides the INITIAL count
    * for experiments; the default is the measured 256.
    */
  def local(cpus: Int, appName: String = "graft"): SparkSession = {
    val b = builder(appName, Some(s"local[$cpus]"), Some(cpus))
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_SHUFFLE").fold(b)(n =>
      b.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", n))
      .getOrCreate()
  }
}
