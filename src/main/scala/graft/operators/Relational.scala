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

  /** Cap rows per key (extension): keep at most `n` rows per `key`,
    * selected deterministically by `ord` ascending (e.g. cap documents per
    * source domain in a training-data pipeline). Ties on `ord` are broken
    * by a content hash of the row's hashable columns, so the selection is
    * reproducible across runs and partitionings even when `ord` is not
    * unique per key. MapType columns are excluded from the tie-break
    * (Spark's hash functions reject them); rows identical in every
    * hashable column remain interchangeable — acceptable residual
    * nondeterminism, as is the rarer hash-collision case (e.g. rows that
    * differ only in which of two null columns is set).
    * Plans as a ranked window that Spark serves with WindowGroupLimitExec —
    * a partial per-partition top-n BEFORE the shuffle, so a 100 TB scan
    * ships at most n rows per key per input partition, never whole groups.
    */
  def capPerKey(df: DataFrame, key: String, n: Int, ord: Column): DataFrame = {
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val hashCols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
    val ordered =
      if (hashCols.isEmpty) w.orderBy(ord.asc)
      else w.orderBy(ord.asc, xxhash64(hashCols.toIndexedSeq: _*).asc)
    df.withColumn("__rn", row_number().over(ordered))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Deterministic hash sample (extension): keep rows whose md5(keyCol)
    * falls under `hexThreshold8` (first 8 hex chars, lexicographic) —
    * ~uniform sampling at rate threshold/16^8 that is reproducible on any
    * cluster, any partitioning, any engine (md5 is engine-neutral, unlike
    * rand() or engine hashes). The sampling DECISION rides the scan
    * (codegen'd md5 + substring compare — no shuffle); the same key always
    * samples the same way, so joins between two sampled tables stay
    * consistent.
    */
  def deterministicSample(df: DataFrame, keyCol: String, hexThreshold8: String): DataFrame =
    df.filter(substring(md5(col(keyCol).cast("string").cast("binary")), 1, 8) < lit(hexThreshold8))

  /** First 8 hex chars of the sampling budget for a fraction in [0, 1]:
    * rows whose md5-prefix sorts below it are kept, so the kept share is
    * ~fraction. 16^8 buckets give ~2.3e-10 rate granularity.
    */
  def fractionToHex8(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    val buckets = (fraction * 4294967296.0d).toLong.min(4294967295L) // 16^8 - 1 cap; 1.0 handled by caller
    f"$buckets%08x"
  }

  /** Stratified deterministic sample (extension): per-stratum keep rates —
    * the domain-rebalancing step of a training-data pipeline ("keep 10% of
    * commoncrawl, all of wikipedia"). Same engine-neutral md5 decision as
    * [[deterministicSample]], so the same key samples identically in any
    * engine, any run, any partitioning — and consistently ACROSS strata
    * configs (lowering a rate always keeps a subset of the higher rate's
    * rows). The decision is a codegen'd projection riding the scan:
    * no shuffle, no sampleBy RNG state.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double): DataFrame = {
    val hash = substring(md5(col(keyCol).cast("string").cast("binary")), 1, 8)
    def keep(f: Double): Column =
      if (f >= 1.0) lit(true) else hash < lit(fractionToHex8(f))
    val cond = fractions.foldLeft(keep(defaultFraction)) { case (els, (stratum, f)) =>
      when(col(strataCol) === lit(stratum), keep(f)).otherwise(els)
    }
    df.filter(cond)
  }
}
