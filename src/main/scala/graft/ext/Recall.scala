package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall measurement for the approximate operators — the harness that turns
  * "no exact oracle" into a measured approximation quality.
  *
  * An approximate operator without a recall number is untunable: a user
  * adjusting LSH tables/planes or IVF nprobe has nothing to optimize
  * against. These helpers compare an approximate result against its exact
  * counterpart (computed by the operators this library already has) and
  * report recall as data. Measurement is join+aggregate shaped — it scales
  * exactly like the operators it measures, so the harness itself is safe to
  * run at full corpus size.
  */
object Recall {

  /** Per-query recall@k of an approximate top-k vs the exact top-k. Both
    * inputs carry (query_id, neighbor_id). Output: one row per query_id —
    * (query_id, n_exact, n_hit, recall), recall = |approx ∩ exact| / |exact|.
    */
  def topKRecall(exact: DataFrame, approx: DataFrame): DataFrame = {
    val ex = exact.select(col("query_id"), col("neighbor_id"))
    val hits = ex
      .join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    val totals = ex.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
    totals.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_exact")).as("recall"))
  }

  /** Recall of an approximate pair generator vs the exact pair set (both
    * ordered id_a < id_b). One summary row: (n_exact, n_found, recall).
    */
  def pairRecall(exact: DataFrame, approx: DataFrame,
      idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val ex = exact.select(col(idA), col(idB))
    val found = ex.join(approx.select(col(idA), col(idB)), Seq(idA, idB), "left_semi")
    ex.agg(count(lit(1)).as("n_exact"))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .select(col("n_exact"), col("n_found"),
        // an empty exact set makes recall vacuous — report 1.0, not null
        // (0/0), so callers reading a Double do not crash on a clean corpus
        when(col("n_exact") === 0, lit(1.0))
          .otherwise(col("n_found").cast("double") / col("n_exact")).as("recall"))
  }

  /** Macro-averaged scalar from [[topKRecall]] output (driver-friendly:
    * 1 row).
    */
  def macroAvg(perQuery: DataFrame): Double =
    perQuery.agg(avg(col("recall"))).head().getDouble(0)
}
