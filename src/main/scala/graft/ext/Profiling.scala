package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-profiling operator — the "describe my table" step every ETL
  * onboarding runs before trusting a source (the reference eyeballs its
  * frames with pandas `.info()`-style checks; this is the engine-native,
  * oracle-testable form).
  *
  * One row per profiled column: total rows, null count, exact distinct
  * count, lexicographic min/max of the string form.
  */
object Profiling {

  /** Profile `cols` of `df` in ONE scan: melt to (column_name, value)
    * pairs with `stack` (a Generate, not an Expand — rows multiply by
    * |cols| AFTER projection pruning, so only the profiled columns are
    * read), then a single groupBy(column_name) aggregation. At scale this
    * is one pass over the profiled bytes and one shuffle keyed by column
    * name with map-side partial aggregation; the alternative — one
    * aggregate job per column — pays |cols| full scans.
    *
    * `value` is the column cast to string, so min/max are lexicographic
    * and engine-neutral; distinct/null counts are unaffected by the cast.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    require(cols.distinct == cols, s"duplicate columns in profile list: $cols")
    val pairs = cols.flatMap(c => Seq(lit(c), col(c).cast("string")))
    val profiled = df
      .select(stack((lit(cols.size) +: pairs): _*).as(Seq("column_name", "value")))
      .groupBy(col("column_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("value"))).as("null_count"),
        countDistinct(col("value")).as("n_distinct"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
    // contract: one row per profiled column even when the input is empty
    // (zero counts, null min/max) — matching what per-column scalar
    // aggregates produce on an empty table
    import df.sparkSession.implicits._
    val names = cols.toDF("column_name")
    names.join(profiled, Seq("column_name"), "left")
      .select(col("column_name"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("null_count"), lit(0L)).as("null_count"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_value"), col("max_value"))
  }
}
