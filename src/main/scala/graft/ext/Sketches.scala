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
}
