package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Joins

/** JDBC source + sink (SURVEY.md §2.1 S6/S7, §2.2 K1/K2).
  *
  * The reference's primary dim/fact I/O is a relational database reached
  * through an engine URL ([function_app.py:186-221] dim scans,
  * [function_app.py:291-315] incremental fact writes). The Spark-native
  * equivalent is the built-in JDBC relation, which keeps the scan
  * declarative: Catalyst pushes filters and column pruning into the SQL it
  * sends, so a dimension `SELECT two, columns FROM dim WHERE k = 1` never
  * ships the whole table.
  *
  * Scale shape:
  *  - dims: one connection, one partition — they are broadcast-scale by
  *    definition, and downstream joins broadcast them ([[Joins.enrich]]);
  *  - facts: [[readPartitioned]] splits the scan into `numPartitions`
  *    range-predicated queries, one connection per executor task — the only
  *    way a JDBC scan parallelizes;
  *  - writes: [[upsertJdbc]] is the same insert-only anti-join merge as
  *    [[graft.operators.Upsert.upsertParquet]] — read only the KEY columns
  *    of the target (column pruning reaches the remote SQL), anti-join,
  *    append the delta through Spark's batched inserts.
  *
  * Tested against Apache Derby embedded (the JDBC driver on the Spark
  * classpath); the code paths are driver-agnostic — any `jdbc:` URL with a
  * registered driver works the same way.
  */
object Jdbc {

  def props(user: Option[String] = None, password: Option[String] = None): Properties = {
    val p = new Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    p
  }

  /** S6 — dimension scan: a lazy JDBC relation; filters/projection are
    * pushed into the generated SQL by Catalyst.
    */
  def readTable(spark: SparkSession, url: String, table: String,
      connProps: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, connProps)

  /** S7 at fact scale — parallel range-partitioned scan: `numPartitions`
    * concurrent queries, each `WHERE partCol BETWEEN …`, one JDBC
    * connection per task. `lower`/`upper` only shape the split points;
    * rows outside the range are still read (Spark's contract).
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partCol: String, lower: Long, upper: Long, numPartitions: Int,
      connProps: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partCol, lower, upper, numPartitions, connProps)

  /** Push an arbitrary SQL text to the database (the reference's
    * hand-written dim queries, [function_app.py:196-204]): the database
    * runs `sql`, Spark scans its result.
    */
  def readQuery(spark: SparkSession, url: String, sql: String,
      connProps: Properties = new Properties()): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url)
      .option("query", sql)
    connProps.stringPropertyNames().toArray(Array.empty[String])
      .foldLeft(reader)((r, k) => r.option(k, connProps.getProperty(k)))
      .load()
  }

  /** Driver-side existence probe via JDBC metadata (identifier case depends
    * on the database's fold rule, so the compare is case-insensitive). The
    * scan is restricted to the connection's current schema when the driver
    * reports one — a same-named table in another schema must not read as
    * "exists" or [[upsertJdbc]] would skip creation and then append into a
    * table the default schema doesn't have.
    */
  def tableExists(url: String, table: String,
      connProps: Properties = new Properties()): Boolean = {
    val conn = DriverManager.getConnection(url, connProps)
    try {
      // getSchema is JDBC 4.1 but some drivers still throw/return null —
      // fall back to the all-schemas scan only in that case. The schema
      // name is a LIKE pattern to getTables: escape its '_'/'%' so
      // 'app_data' doesn't also match 'app1data'.
      val meta = conn.getMetaData
      val schemaPattern = {
        val s = try conn.getSchema catch { case _: Throwable => null }
        val esc = try meta.getSearchStringEscape catch { case _: Throwable => null }
        if (s == null || esc == null || esc.isEmpty) s
        else s.replace(esc, esc + esc)
          .replace("_", esc + "_").replace("%", esc + "%")
      }
      val rs = meta.getTables(null, schemaPattern, null, Array("TABLE"))
      var found = false
      while (!found && rs.next())
        found = rs.getString("TABLE_NAME").equalsIgnoreCase(table)
      found
    } finally conn.close()
  }

  /** K1/K2 over JDBC — create-if-absent, insert-only merge on `keys`,
    * identical idempotence contract to
    * [[graft.operators.Upsert.upsertParquet]]: re-running a window never
    * duplicates a business key. The existing side is pruned to the key
    * columns BEFORE the anti join (pruning reaches the remote SQL), and the
    * delta is materialized (localCheckpoint) before the append so the
    * insert job cannot re-query the table it is inserting into.
    *
    * Returns the number of rows appended.
    */
  def upsertJdbc(incoming: DataFrame, url: String, table: String, keys: Seq[String],
      connProps: Properties = new Properties()): Long = {
    val spark = incoming.sparkSession
    val existed = tableExists(url, table, connProps)
    val fresh =
      if (!existed) incoming
      else Joins.antiByKey(incoming, readTable(spark, url, table, connProps), keys)
    val materialized = fresh.localCheckpoint()
    try {
      val n = materialized.count()
      if (n > 0 || !existed) {
        // append mode creates the table when missing (K1), including for an
        // empty first batch — schema from the DataFrame.
        materialized.write.mode("append").jdbc(url, table, connProps)
      }
      n
    } finally { materialized.unpersist(); () }
  }
}
