package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Population stability index between two snapshots of a numeric
    * column, per group — THE feature-drift score a data pipeline runs
    * before retraining on a new corpus cut: fixed-width bins (the q107
    * histogram convention), p = bin share in snapshot A, q = in B,
    * PSI = Σ (p−q)·ln(p/q) over bins populated on BOTH sides, with the
    * one-sided bin counts reported alongside (the standard smoothing
    * decision is the caller's; reporting beats silently fabricating an
    * epsilon). PSI < 0.1 is stable, 0.1-0.25 drifting, > 0.25 shifted.
    *
    * Determinism: p and q are ratios of exact integers (identical doubles
    * in every engine), each transcendental term is rounded to 6 dp and
    * lifted to DECIMAL(18,6) before the sum (order-free), final round 6 dp.
    * Shape: one hash agg per snapshot to |groups|·|bins| rows, a window
    * for the per-group totals over that tiny frame, one full outer join on
    * (group, bin), one fold — the fact rows are touched exactly once each.
    */
  def populationStability(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth > 0")
    def binned(df: DataFrame, cnt: String) = df
      .groupBy(col(groupCol), floor(col(valueCol) / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as(cnt))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    val ca = binned(a, "na").withColumn("ta", sum(col("na")).over(w))
    val cb = binned(b, "nb").withColumn("tb", sum(col("nb")).over(w))
    val j = ca.join(cb, Seq(groupCol, "bin"), "full")
    val p = col("na").cast("double") / col("ta").cast("double")
    val q = col("nb").cast("double") / col("tb").cast("double")
    val term = round((p - q) * log(p / q), 6).cast("decimal(18,6)")
    j.groupBy(col(groupCol))
      .agg(max(col("ta")).as("n_a"), max(col("tb")).as("n_b"),
        count(when(col("na").isNotNull && col("nb").isNotNull, 1)).as("n_bins_both"),
        count(when(col("nb").isNull, 1)).as("n_bins_a_only"),
        count(when(col("na").isNull, 1)).as("n_bins_b_only"),
        sum(when(col("na").isNotNull && col("nb").isNotNull, term)).as("__psum"))
      .select(col(groupCol), col("n_a"), col("n_b"), col("n_bins_both"),
        col("n_bins_a_only"), col("n_bins_b_only"),
        round(col("__psum").cast("double"), 6).as("psi"))
  }

  /** Robust per-group outlier screen on median absolute deviation — the
    * MAD complement to the IQR fence (q121): med = exact interpolated
    * p50, mad = p50 of |x − med|, outliers beyond k·mad. MAD tolerates
    * up to 50% contamination where IQR's quartiles break at 25%, which
    * is why cleaning pipelines run both. Stat frames are one row per
    * group (bounded domain) and broadcast back — the fence comparison
    * rides the scan.
    *
    * Both medians ride the histogram-percentile operator
    * (Aggregates.exactPercentilesByKey): a hash aggregate to
    * (group, value, count) plus a window over the per-group HISTOGRAM,
    * never a per-group value buffer. Spark's exact `percentile` UDAF
    * buffers every value of a group in one aggregation buffer — with a
    * bounded group domain that is O(corpus) memory on a handful of
    * tasks, an executor OOM cliff at scale (measured as recurring ~19 s
    * GC spikes at sf1 before this rewrite; steady 4.6-5.2 s after).
    * The histogram rows are |distinct values per group| — bounded by
    * the value DOMAIN (2-decimal prices here), not the row count — and
    * the interpolation formula is identical, so the result is
    * bit-for-bit the same (q154 hash-matches quantile_cont unchanged).
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double): DataFrame = {
    import graft.operators.Aggregates
    // ONE fact pass (guide §1.1 first-principles): the fact collapses to
    // the (group, value) histogram once; both medians, the deviation
    // column and the fence counts are then derived ON the histogram —
    // |x − med| per DISTINCT value with counts carried, the exact same
    // multiset the four-scan form fed per row, so every output bit is
    // unchanged (q154's DuckDB oracle pins it). Before: 4 scans of the
    // fact + 3 recomputations of the deviation join; after: one hash agg
    // of the fact, everything else |histogram|-sized.
    val hist = df
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__w"))
      .localCheckpoint()
    val med = Aggregates.exactPercentilesByKey(hist, groupCol, valueCol,
      Seq(0.5 -> "median"), Some("__w"))
    val adHist = hist.join(broadcast(med), Seq(groupCol))
      .withColumn("__ad", abs(col(valueCol) - col("median")))
    val mad = Aggregates.exactPercentilesByKey(
      adHist.select(col(groupCol), col("__ad"), col("__w")), groupCol, "__ad",
      Seq(0.5 -> "mad"), Some("__w"))
    adHist.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(sum(col("__w")).as("n"),
        max(col("median")).as("median"),
        max(col("mad")).as("mad"),
        sum(when(col("__ad") > lit(k) * col("mad"), col("__w"))
          .otherwise(0L)).as("n_outliers"))
  }

  /** Per-group ordinary least squares of y on x for 2-decimal inputs —
    * trend-per-segment in ONE aggregate pass, the q59 integer-moment
    * discipline end to end: inputs lift to scaled longs (×100, exact for
    * 2-dec doubles), the five moments sum as DECIMAL(38,0) (overflow-free
    * at any group size; long-backed fast path), and each integer sum gets
    * one correctly-rounded cast to double before the closed-form
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    * (the ×10⁴ scale cancels in slope and r²; intercept divides the means
    * back by 100). Bit-reproducible on any cluster and engine because the
    * doubles derive from identical integers through an identical
    * expression tree. Degenerate groups (zero x-variance) emit null slope/
    * intercept/r² rather than ±Inf.
    */
  def groupOls(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val d380 = org.apache.spark.sql.types.DecimalType(38, 0)
    val x100 = round(col(xCol) * lit(100)).cast("long")
    val y100 = round(col(yCol) * lit(100)).cast("long")
    val m = df
      .select(col(groupCol), x100.as("x"), y100.as("y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(d380)).as("sx"),
        sum(col("y").cast(d380)).as("sy"),
        sum((col("x") * col("y")).cast(d380)).as("sxy"),
        sum((col("x") * col("x")).cast(d380)).as("sxx"),
        sum((col("y") * col("y")).cast(d380)).as("syy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
    val dx = n * sxx - sx * sx
    val dy = n * syy - sy * sy
    val num = n * sxy - sx * sy
    val slope = when(dx > lit(0.0), num / dx)
    val r2 = when(dx > lit(0.0) && dy > lit(0.0), (num * num) / (dx * dy))
    m.select(col(groupCol), col("n"),
      slope.as("slope"),
      when(dx > lit(0.0), (sy / n - (num / dx) * (sx / n)) / lit(100.0)).as("intercept"),
      r2.as("r2"))
  }

  /** Key-skew diagnostics for planning a shuffle — the measurement that
    * decides BETWEEN the engine's three skew tools before the expensive
    * job runs: broadcast the other side (key domain tiny), salt the key
    * ([[graft.operators.Joins.saltedJoin]], q58), or trust AQE's runtime
    * skew split. For each of the `topK` heaviest keys: the exact count,
    * its corpus share in ppm, and the minimal salt factor that spreads
    * the key across reducers no heavier than the even share —
    * `ceil(cnt·parts/total)` — all EXACT integer arithmetic (`div`, no
    * share doubles), so the recommendation is engine-reproducible.
    *
    * Shape at 100 TB: ONE hash aggregate on the profiled key (map-side
    * partials — the same shuffle the production job would pay, minus the
    * payload), a 1-row total frame broadcast back, and a bounded
    * top-k tail (`TakeOrderedAndProject`) ordered by `(cnt DESC, key
    * ASC)` — a total order, so the cut is deterministic. Nothing
    * key-domain-sized ever reaches the driver.
    */
  def skewProfile(df: DataFrame, keyCol: String, parts: Int, topK: Int): DataFrame = {
    require(parts > 0, s"parts must be positive, got $parts")
    require(topK > 0, s"topK must be positive, got $topK")
    // NULL keys fold into one labeled sentinel group: a NULL shuffle key is
    // itself a (often THE) skew hotspot, so it must appear in the profile —
    // and a string sentinel keeps the (cnt DESC, key ASC) cut a total order
    // with identical NULL placement in every engine (Spark sorts NULL first
    // ASC, DuckDB last — the sentinel removes the divergence).
    val counts = df.groupBy(
        coalesce(col(keyCol).cast("string"), lit("<null>")).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col("key"), col("cnt"),
        expr("cnt * 1000000 div __total").as("share_ppm"),
        expr(s"(cnt * $parts + __total - 1) div __total").as("salt"))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topK)
  }

  /** Mergeable fixed-width histogram cells — the DISTRIBUTION member of
    * the materialized-summary family ([[graft.ext.Sketches]] HLL =
    * distinct counts, [[graft.ext.Cms]] = frequencies, this = quantiles).
    * One corpus scan bins `valueCol` into ≤ nBins integer buckets per
    * (keyCol, subCol) cell — `bin = min(nBins−1, value div binWidth)`,
    * pure integer arithmetic, so any engine reproduces the cell table
    * bit-for-bit and the downstream percentiles are EXACTLY
    * oracle-checkable (q197), not tolerance-pinned. Cells
    * map-side-combine (≤ nBins groups per cell however many rows feed
    * them), persist to parquet at the finest grain a pipeline reports
    * on, and roll up to ANY coarser grain by counter addition — the q47
    * exact-percentile operator answers one grain from raw data; this
    * answers every grain from kilobytes. Contract: values are
    * non-negative longs (lengths, counts, byte sizes — the profiling
    * domain); NULL and negative values carry no mass.
    */
  def histCells(df: DataFrame, keyCol: String, subCol: String,
      valueCol: String, binWidth: Long, nBins: Int): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    df.select(col(keyCol), col(subCol), col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("__v") >= 0)
      .withColumn("bin", least(lit(nBins - 1L), expr(s"__v div $binWidth")))
      .groupBy(col(keyCol), col(subCol), col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Percentile rollup from materialized [[histCells]]: merge cells up to
    * `keyCol` (counter sum — the mergeability that makes the cells worth
    * persisting), one cumulative pass over the ≤ nBins merged bins per
    * key, and each requested percentile p reports the LOWER EDGE of the
    * first bin whose cumulative count reaches ⌈p% of the key's mass⌉.
    * That bin contains the discrete p-th percentile by construction, so
    * the approximation error is bounded by binWidth STRUCTURALLY — a
    * theorem, not a measurement, which is why no tolerance witness is
    * needed. The window partitions are ≤ nBins rows per key regardless
    * of input size. Output: (keyCol, p<p>_lo ...), one column per
    * requested percentile, integer bin edges.
    */
  def histRollupPercentiles(cells: DataFrame, keyCol: String,
      binWidth: Long, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $pcts")
    val merged = cells.groupBy(col(keyCol), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))
    val cum = merged
      .withColumn("__cum", sum(col("cnt")).over(
        Window.partitionBy(col(keyCol)).orderBy(col("bin").asc)))
      .withColumn("__tot", sum(col("cnt")).over(
        Window.partitionBy(col(keyCol))))
    val aggs = pcts.map(p =>
      (min(when(col("__cum") * 100 >= col("__tot") * p, col("bin")))
        * binWidth).as(s"p${p}_lo"))
    cum.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }
}
