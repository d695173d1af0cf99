package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Incremental insert-only merge sink (SURVEY.md §2.2 K1/K2).
  *
  * Reference semantics ([function_app.py:291-315, 363-388]): if the target
  * table does not exist, create it and append everything; otherwise read the
  * existing table, anti-join the incoming batch on the business key, and
  * append only the genuinely new rows. Re-running a window is therefore
  * idempotent (at-least-once per key, never duplicated).
  *
  * Scale notes vs the reference's `SELECT *` re-scan:
  *  - the existing side is pruned to the key columns before the anti join
  *    (parquet column pruning — we never re-read the fat fact columns);
  *  - with `partitionCol` set, the target is laid out by that column
  *    (typically the date) so the next run's anti join and any downstream
  *    ranged scans prune partitions instead of scanning history.
  */
object Upsert {

  def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  /** Returns the number of rows appended. */
  def upsertParquet(
      spark: SparkSession,
      incoming: DataFrame,
      path: String,
      keys: Seq[String],
      partitionCol: Option[String] = None): Long = {
    val fresh =
      if (!tableExists(spark, path)) incoming
      else Joins.antiByKey(incoming, spark.read.parquet(path), keys)
    // One pass decides and writes; count() on the written result would
    // recompute the anti join, so persist the small delta first.
    val materialized = fresh.persist()
    try {
      val n = materialized.count()
      if (n > 0) {
        val w = materialized.write.mode("append")
        partitionCol.fold(w)(c => w.partitionBy(c)).parquet(path)
      } else if (!tableExists(spark, path)) {
        // create-if-absent even when the first batch is empty (K1)
        val w = materialized.write.mode("append")
        partitionCol.fold(w)(c => w.partitionBy(c)).parquet(path)
      }
      n
    } finally materialized.unpersist()
  }

  /** Pure (non-writing) form of the merge for plan-level composition and
    * oracle testing: existing ∪ (incoming ⟕anti existing on keys).
    */
  def mergeInsertOnly(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(Joins.antiByKey(incoming, existing, keys).select(existing.columns.map(col): _*))
}
