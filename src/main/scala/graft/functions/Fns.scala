package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar-function layer: Spark-native equivalents of every scalar op the
  * reference uses (SURVEY.md §2.9 F1-F13), plus the determinism helpers the
  * engine needs for oracle-exact aggregation at scale.
  *
  * All of these stay inside whole-stage codegen (pure Catalyst expressions,
  * no UDFs), so they cost nothing extra on a 100 TB scan.
  */
object Fns {

  /** F1 — string/any → timestamp ([function_app.py:154,179,180]). */
  def toTs(c: Column): Column = to_timestamp(c)

  /** F2 — timestamp → date ([function_app.py:154]). */
  def toDateCol(c: Column): Column = to_date(c)

  /** F3 — interval between two timestamps in fractional hours
    * ([function_app.py:181]: `(out - in).dt.total_seconds() / 3600`).
    */
  def hoursBetween(tsOut: Column, tsIn: Column): Column =
    (unix_timestamp(tsOut) - unix_timestamp(tsIn)) / lit(3600.0)

  /** F4 — format date/timestamp as `YYYY-MM-DD` ([function_app.py:101]). */
  def fmtDate(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** F6 — inclusive 1-day date spine ([function_app.py:93] `pd.date_range`).
    * Relational replacement for the reference's per-day fetch loop: the
    * spine is generated, exploded and joined instead of iterated.
    */
  def dateSpine(from: String, to: String): Column =
    explode(sequence(
      to_date(lit(from), "yyyy-MM-dd"),
      to_date(lit(to), "yyyy-MM-dd"),
      expr("interval 1 day")))

  /** F7+F8 — case-insensitive substring containment, reference direction:
    * dim value contained in fact value ([function_app.py:254]).
    */
  def containsCI(hay: Column, needle: Column): Column =
    lower(hay).contains(lower(needle))

  /** Order-independent, bit-exact SUM over doubles.
    *
    * Naive `sum(double)` depends on accumulation order, which differs per
    * shuffle/partitioning — unacceptable both for the DuckDB-oracle hash
    * compare and for run-to-run reproducibility on a cluster. Casting each
    * element to a fixed-scale decimal makes the sum exact and associative
    * (decimal addition is order-free), then one final cast back to double.
    * decimal(18,4) holds |x| < 10^14 per element; the sum is carried at
    * decimal(28,4).
    */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** A 2-decimal-valued double column lifted into the decimal domain.
    * Inputs known to carry exactly 2 fractional digits (prices, rates)
    * cast losslessly and identically in every engine — the double noise
    * (~1e-13) is far from the .005 rounding boundary.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Bit-exact SUM of `price * (1 - rate)` for 2-decimal inputs.
    *
    * Multiplying the *doubles* first and casting the product rounds a
    * 4-to-6-decimal value whose double representation can sit exactly on
    * a rounding tie, where engines disagree (Spark HALF_UP on the shortest
    * decimal repr vs DuckDB on the binary value). Doing the arithmetic in
    * the decimal domain — (18,2)·(5,2) → (24,4) — is exact, associative,
    * and engine-independent; one final cast back to double.
    */
  def dsumDisc(price: Column, rate: Column): Column =
    sum(dec2(price) * (lit(1).cast(DecimalType(3, 2)) - rate.cast(DecimalType(4, 2))))
      .cast("double")

  /** Bit-exact SUM of `price * (1 - rate1) * (1 + rate2)` — decimal-domain
    * triple product (24,4)·(5,2) → (30,6), exact at any accumulation order.
    */
  def dsumCharge(price: Column, rate1: Column, rate2: Column): Column =
    sum(dec2(price)
        * (lit(1).cast(DecimalType(3, 2)) - rate1.cast(DecimalType(4, 2)))
        * (lit(1).cast(DecimalType(3, 2)) + rate2.cast(DecimalType(4, 2))))
      .cast("double")

  /** Order-independent mean built from [[dsum]] / count. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double") / count(c)

  /** F11/F12 — per-column null defaults ([function_app.py:274,341]). */
  def fillDefaults(defaults: Map[String, Any]): org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
    df => df.na.fill(defaults)
}
