package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count summaries as MATERIALIZED data, not just an
  * aggregate result: build one DataSketches HLL sketch per fine-grained
  * cell (e.g. per source×lang, per day×source), keep the sketch BINARY
  * column, and answer any coarser distinct-count question later by
  * UNIONING cell sketches — without rescanning the corpus.
  *
  * This is the pattern that makes distinct-count reporting tractable at
  * 100 TB: the expensive pass over raw data happens once at the finest
  * grain (embarrassingly parallel, map-side partial sketches merged per
  * cell), the result is a few KB per cell, and every rollup after that is
  * arithmetic on kilobytes. [[graft.SparkEntry]] q53 is the direct
  * `approx_count_distinct` form (one-shot, result-only); this module is
  * the reusable form the one-shot cannot express.
  *
  * Estimator honesty: DataSketches HLL keeps a historic-inverse-
  * probability (HIP) estimator for sketches built from a single stream,
  * but a sketch produced by a UNION must fall back to the composite
  * register estimator — so `estimate(union(cells))` is NOT bit-equal to
  * `estimate(direct)` in general, even though both sketch the same set.
  * [[hllRollup]] therefore emits BOTH estimates, and [[hllRollupCheck]]
  * bounds each against the exact distinct count instead of pretending
  * they coincide. (At small cardinalities, below ~lgK coupons, both paths
  * stay in exact coupon-list mode and all three numbers agree exactly.)
  */
object Sketches {

  /** Two-level HLL rollup of `count(distinct valueCol)` by `keyCol`.
    *
    * Level 1 (the materialization grain) sketches each (keyCol, subCol)
    * cell: one `hll_sketch_agg` — map-side partial sketches, one small
    * binary per cell, the thing a production pipeline would persist to
    * parquet alongside the partition it summarizes. Level 2 unions the
    * cell sketches per key (`hll_union_agg` — kilobyte inputs, trivial
    * shuffle) and estimates. The direct single-pass estimate per key is
    * computed alongside as the cross-check column.
    *
    * Output: (keyCol, n_cells: bigint, est_merged: bigint,
    * est_direct: bigint), one row per key. Both estimates are
    * deterministic (fixed sketch seed); they are estimates, so the
    * catalog entry is pinned rows+schema with [[hllRollupCheck]] as the
    * oracle-checked companion.
    */
  def hllRollup(df: DataFrame, keyCol: String, subCol: String,
      valueCol: String, lgK: Int = 12): DataFrame = {
    val cells = cellSketches(df, keyCol, subCol, valueCol, lgK)
    val merged = mergeCells(cells, keyCol)
    val direct = df.groupBy(col(keyCol))
      .agg(hll_sketch_estimate(hll_sketch_agg(col(valueCol), lit(lgK)))
        .as("est_direct"))
    merged.join(direct, Seq(keyCol))
  }

  /** Level 1 alone: the per-cell sketch table (keyCol, subCol,
    * sketch: binary). This is the frame a pipeline persists; it
    * round-trips through parquet (see SketchesSpec) and feeds
    * [[mergeCells]] at any later time.
    */
  def cellSketches(df: DataFrame, keyCol: String, subCol: String,
      valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(col(keyCol), col(subCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Level 2 alone: union previously materialized cell sketches up to
    * `keyCol` and estimate. Touches only sketch bytes — no raw data.
    */
  def mergeCells(cells: DataFrame, keyCol: String): DataFrame =
    cells.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_cells"),
        hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
          .as("est_merged"))

  /** Oracle-checked companion (q98 convention): both estimate paths must
    * land within `tol` relative error of the EXACT per-key distinct
    * count. The default 0.15 is generous for lgK=12 (~1.6% RSE, so 15%
    * is a ~9-sigma deterministic bound); at the test corpus's
    * sub-coupon-threshold cardinalities the estimates are exact and the
    * check is an equality in disguise.
    * Output: (keyCol, merged_within_tol, direct_within_tol) — the oracle
    * asserts TRUE per key.
    */
  def hllRollupCheck(df: DataFrame, keyCol: String, subCol: String,
      valueCol: String, lgK: Int = 12, tol: Double = 0.15): DataFrame = {
    val exact = df.groupBy(col(keyCol))
      .agg(countDistinct(col(valueCol)).as("exact"))
    hllRollup(df, keyCol, subCol, valueCol, lgK)
      .join(exact, Seq(keyCol))
      .select(col(keyCol),
        (abs(col("est_merged") - col("exact")).cast("double") / col("exact")
          <= tol).as("merged_within_tol"),
        (abs(col("est_direct") - col("exact")).cast("double") / col("exact")
          <= tol).as("direct_within_tol"))
  }

  /** Pairwise set-ALGEBRA over sketched sets: for every unordered pair of
    * `setCol` groups, the estimated distinct-value overlap via
    * inclusion–exclusion — `|A∩B| ≈ est(A) + est(B) − est(A∪B)` — where
    * est(A∪B) is a sketch UNION, the one set operation HLL supports
    * natively. This answers "how many users do segments A and B share",
    * "how much does source X's vocabulary overlap source Y's" from the
    * same materialized cell sketches as [[hllRollup]]: the raw data is
    * scanned ONCE (one sketch per group), then all n·(n−1)/2 pair
    * estimates are arithmetic on kilobytes — at 100 TB the alternative is
    * a self-join per pair.
    *
    * The pair fan-out is |groups|² sketch pairs — groups are segments /
    * sources / langs (dozens), so the cross join is a broadcast of a
    * dim-sized frame, never data-sized. Error honesty: each of the three
    * terms carries ~1.04/√2^lgK relative error of ITS OWN set size, so
    * the intersection estimate's error is bounded by ~3σ·|A∪B| — relative
    * to the UNION, not the (possibly tiny) intersection;
    * [[hllIntersectCheck]] asserts exactly that union-relative band.
    * Estimates ⇒ pinned head + oracle-checked band companion.
    * Output: (set_a, set_b, est_a, est_b, est_union, est_intersect), one
    * row per unordered pair, set_a < set_b.
    */
  def hllIntersect(df: DataFrame, setCol: String, valueCol: String,
      lgK: Int = 12): DataFrame = {
    val sk = df.groupBy(col(setCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))
      .withColumn("est", hll_sketch_estimate(col("sketch")))
    val a = sk.select(col(setCol).as("set_a"), col("sketch").as("__ska"),
      col("est").as("est_a"))
    val b = sk.select(col(setCol).as("set_b"), col("sketch").as("__skb"),
      col("est").as("est_b"))
    a.join(b, col("set_a") < col("set_b"))
      .select(col("set_a"), col("set_b"), col("est_a"), col("est_b"),
        hll_sketch_estimate(hll_union(col("__ska"), col("__skb")))
          .as("est_union"))
      .withColumn("est_intersect",
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")))
  }

  /** Oracle-checked companion: for every pair, the inclusion–exclusion
    * intersection estimate must land within `tol` of the exact overlap,
    * measured RELATIVE TO THE EXACT UNION size (the theoretically honest
    * denominator — see [[hllIntersect]]). Output: (set_a, set_b,
    * within_tol); the oracle asserts TRUE per pair.
    */
  def hllIntersectCheck(df: DataFrame, setCol: String, valueCol: String,
      lgK: Int = 12, tol: Double = 0.15): DataFrame = {
    val s = df.select(col(setCol).as("__set"), col(valueCol).as("__v"))
    val ex = s.as("l").join(s.as("r"),
        col("l.__v") === col("r.__v") && col("l.__set") < col("r.__set"))
      .select(col("l.__set").as("set_a"), col("r.__set").as("set_b"),
        col("l.__v").as("__v"))
      .groupBy(col("set_a"), col("set_b"))
      .agg(countDistinct(col("__v")).as("exact_intersect"))
    val sizes = s.groupBy(col("__set"))
      .agg(countDistinct(col("__v")).as("__n"))
    hllIntersect(df, setCol, valueCol, lgK)
      .join(ex, Seq("set_a", "set_b"), "left")
      .join(sizes.select(col("__set").as("set_a"), col("__n").as("__na")),
        Seq("set_a"))
      .join(sizes.select(col("__set").as("set_b"), col("__n").as("__nb")),
        Seq("set_b"))
      .select(col("set_a"), col("set_b"),
        (abs(col("est_intersect") - coalesce(col("exact_intersect"), lit(0L)))
          .cast("double")
          <= lit(tol) * (col("__na") + col("__nb")
            - coalesce(col("exact_intersect"), lit(0L))))
          .as("within_tol"))
  }
}
