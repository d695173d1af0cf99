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
  * left to AQE coalescing), not a library default.
  */
object Session {
  def builder(
      appName: String = "graft",
      master: Option[String] = None,
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    val withMaster = master.fold(b)(b.master)
    shufflePartitions.fold(withMaster)(n =>
      withMaster.config("spark.sql.shuffle.partitions", n.toString))
  }

  /** Local session for tests/tools: `local[cpus]` with matching shuffle
    * parallelism and no UI.
    */
  def local(cpus: Int, appName: String = "graft"): SparkSession =
    builder(appName, Some(s"local[$cpus]"), Some(cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
