package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation layer (SURVEY.md §2.5 A1-A5, §2.6).
  *
  * pandas `first`/`last`/`idxmax` depend on physical row order; Spark has no
  * stable row order, so the engine's deterministic contract is: every
  * order-sensitive aggregate takes an explicit ordinal column and is
  * expressed as `min_by`/`max_by` (single hash-agg pass, map-side partials,
  * no window shuffle) or a ranking window when the whole row is needed.
  */
object Aggregates {

  /** A2 `first` with explicit ordering: value at the smallest ordinal. */
  def firstBy(value: Column, ord: Column): Column = min_by(value, ord)

  /** A1 `last` with explicit ordering: value at the largest ordinal. */
  def lastBy(value: Column, ord: Column): Column = max_by(value, ord)

  /** A1 — dedupe to one row per natural key, keeping the row with the
    * largest ordinal ([function_app.py:200-202]: groupby(key).last()).
    * One hash aggregation; at scale this is a single shuffle on the key
    * with map-side combine, cheaper than a row_number window.
    */
  def dedupeLastByKey(df: DataFrame, key: String, ord: String): DataFrame = {
    val others = df.columns.filter(c => c != key)
    df.groupBy(col(key))
      .agg(
        max_by(struct(others.map(col): _*), col(ord)).as("__row"))
      .select(col(key) +: others.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** A4 — argmax row per group ([function_app.py:263-264]: idxmax + loc):
    * the full row with the maximum `ord` per `keys`, ties broken by
    * `tiebreak` ascending so the result is deterministic.
    */
  def argmaxRowPerGroup(df: DataFrame, keys: Seq[String], ord: String, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ord).desc, col(tiebreak).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
