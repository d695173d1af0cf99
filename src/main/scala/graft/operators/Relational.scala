package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Projection / filter / set-op layer (SURVEY.md §2.3 P1-P7, §2.7, §2.8). */
object Relational {

  /** P1 — column projection. */
  def project(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  /** P2 — derived column ([function_app.py:151-181] column assembly). */
  def derive(df: DataFrame, name: String, e: Column): DataFrame =
    df.withColumn(name, e)

  /** P4 — bulk rename ([function_app.py:351-355]). */
  def rename(df: DataFrame, mapping: Map[String, String]): DataFrame =
    df.withColumnsRenamed(mapping)

  /** Ranged scan (S3/S4): the reference's per-day fetch loop collapses into
    * one predicate that Catalyst pushes into the parquet reader.
    */
  def rangedScan(df: DataFrame, tsCol: String, fromInclusive: String, toExclusive: String): DataFrame =
    df.filter(
      col(tsCol) >= to_timestamp(lit(fromInclusive)) &&
      col(tsCol) < to_timestamp(lit(toExclusive)))

  /** U1 — UNION ALL by column name, tolerating missing columns like
    * `pd.concat` ([function_app.py:86, 121]).
    */
  def unionAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** §2.7 — deterministic top-k: total order must include a unique
    * tie-break column or the result set is not reproducible across runs.
    * Spark executes this as TakeOrderedAndProject: per-partition top-k then
    * a k-row merge on the driver — no global sort at scale.
    */
  def topK(df: DataFrame, k: Int, order: Seq[Column]): DataFrame =
    df.orderBy(order: _*).limit(k)
}
