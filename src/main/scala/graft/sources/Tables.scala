package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
