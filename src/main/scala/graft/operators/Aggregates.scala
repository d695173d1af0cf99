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
        max_by(struct(others.toSeq.map(col): _*), col(ord)).as("__row"))
      .select((col(key) +: others.map(c => col(s"__row.$c").as(c))).toSeq: _*)
  }

  /** A4 — argmax row per group ([function_app.py:263-264]: idxmax + loc):
    * the full row with the maximum `ord` per `keys`, ties broken by
    * `tiebreak` ascending so the result is deterministic.
    */
  def argmaxRowPerGroup(df: DataFrame, keys: Seq[String], ord: String, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ord).desc, col(tiebreak).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact interpolated percentiles per key WITHOUT buffering values: the
    * input collapses to a (key, value) → count histogram first (map-side
    * combined — one shuffle of the reduced keyspace), then window cumsums
    * over the histogram locate each percentile's bracketing values and
    * interpolate. Memory scales with |distinct values| per key, not |rows|,
    * so a 100 TB column with bounded cardinality aggregates like a count.
    *
    * Matches `percentile(value, p)` / DuckDB `quantile_cont` exactly: for
    * zero-based position h = p·(n-1), result =
    * x[⌊h⌋] + (h-⌊h⌋)·(x[⌈h⌉]-x[⌊h⌋]) over the sorted multiset.
    *
    * Output: key column plus one double column per (p, name) in `ps`.
    */
  def exactPercentilesByKey(df: DataFrame, key: String, valueCol: String,
      ps: Seq[(Double, String)]): DataFrame =
    exactPercentilesByKey(df, key, valueCol, ps, None)

  /** As above, with `df` already collapsed to a (key, value) → weight
    * histogram when `weightCol` is given: the multiset the interpolation
    * runs over is identical (each value repeated `weight` times), so the
    * result is bit-for-bit the same while the caller's fact table is
    * touched ZERO further times — the one-fact-pass contract
    * [[graft.ext.Profiling.madOutliers]] composes on.
    */
  def exactPercentilesByKey(df: DataFrame, key: String, valueCol: String,
      ps: Seq[(Double, String)], weightCol: Option[String]): DataFrame = {
    // percentile()/quantile_cont ignore nulls — drop them before the
    // histogram or they would count toward n and sort ahead of every value
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(key), col(valueCol))
      .agg(weightCol.fold(count(lit(1)))(w => sum(col(w))).as("__cnt"))
    val wOrd = Window.partitionBy(col(key)).orderBy(col(valueCol))
    val wAll = Window.partitionBy(col(key))
    val h = hist
      .withColumn("__cum", sum(col("__cnt")).over(wOrd))
      .withColumn("__n", sum(col("__cnt")).over(wAll))
      .withColumn("__prev", col("__cum") - col("__cnt"))
    def pos(p: Double): Column = lit(p) * (col("__n") - lit(1)).cast("double")
    def vAt(idx: Column): Column =
      min(when(idx >= col("__prev") && idx < col("__cum"), col(valueCol)))
    val aggs = ps.flatMap { case (p, name) =>
      Seq(vAt(floor(pos(p))).as(s"__lo_$name"), vAt(ceil(pos(p))).as(s"__hi_$name"))
    }
    val agg = h.groupBy(col(key)).agg(max(col("__n")).as("__n"), aggs: _*)
    val outs = ps.map { case (p, name) =>
      val hp = lit(p) * (col("__n") - lit(1)).cast("double")
      val frac = hp - floor(hp).cast("double")
      (col(s"__lo_$name") + frac * (col(s"__hi_$name") - col(s"__lo_$name")))
        .cast("double").as(name)
    }
    val computed = agg.select(col(key) +: outs: _*)
    // groups whose values are ALL null have no histogram rows but must
    // still appear (with null percentiles), exactly like percentile() /
    // quantile_cont — restore them from the distinct key set. The join is
    // null-safe (<=>): NULL is an ordinary group key to percentile(), so a
    // NULL-key group must keep its computed percentiles, not be re-nulled.
    val keys = df.select(col(key)).distinct()
    keys.join(computed, keys(key) <=> computed(key), "left")
      .select(keys(key) +: ps.map { case (_, name) => computed(name) }: _*)
  }
}
