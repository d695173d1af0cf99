package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch as a RELATIONAL, engine-neutral, mergeable frequency
  * summary — the frequency-domain sibling of [[Sketches]]' HLL family
  * (which answers "how many distinct", while this answers "how often").
  * The catalog's q108 exercises Spark's built-in
  * `DataFrameStatFunctions.countMinSketch` — a DRIVER-SIDE model object;
  * this module is the distributed form, where the sketch is itself a
  * DataFrame a pipeline can persist, merge, and join against.
  *
  * The sketch is a plain DataFrame of `(row, col, cnt)` counters, at most
  * `depth × width` rows REGARDLESS of input size: the corpus scan
  * map-side-combines into ≤ d·w groups per task, so the shuffle that
  * builds the sketch moves kilobytes at any corpus scale, and the result
  * is data a pipeline can persist to parquet next to the partition it
  * summarizes. Two sketches with the same (depth, width) merge by
  * summing counters ([[merge]]) — the property that lets 1000 executors
  * (or 1000 days of partitions) sketch independently and combine.
  *
  * Engine-neutral hashing: row i of the sketch hashes key k to column
  * `int(md5(i + ":" + k)[0:13 hex]) mod width` — the project's md5
  * convention (see `Mixing.weightedReservoir`'s numeric uniform), chosen
  * because ANY engine reproduces it bit-for-bit. The point estimates and
  * inner products computed here are therefore DETERMINISTIC, and the
  * DuckDB oracle recomputes the entire sketch and hash-matches the
  * estimates exactly (q194/q195) — a stronger gate than the tolerance
  * pins probabilistic sketches normally get. The CMS theory bands
  * (no-underestimate; overshoot ≤ O(N/width) w.h.p.) are asserted
  * separately by [[bandsCheck]] (q196).
  *
  * Why this matters at 100 TB: a CMS answers per-key frequency queries
  * and join-size estimates from constant-size state. [[joinSizeEstimate]]
  * is the classic pre-flight the optimizer literature builds on sketch
  * inner products — `|A ⋈ B| = Σ_k f_A(k)·f_B(k)` estimated by the
  * row-wise minimum of counter dot products — which prices a join from
  * two O(d·w) summaries BEFORE any executor shuffles a row of it: the
  * same governance posture as `Similarity.estimateBucketedCandidates`
  * (q174), extended from self-join pair volume to arbitrary equi-joins.
  */
object Cms {

  /** Column index of `key` in sketch row `row`: md5("row:key") 13-hex
    * prefix mod width. 13 hex digits = 52 bits, exact in a long.
    */
  private def bucketCol(row: org.apache.spark.sql.Column,
      key: org.apache.spark.sql.Column, width: Int) =
    pmod(conv(substring(md5(concat(row.cast("string"), lit(":"), key)
      .cast("binary")), 1, 13), 16, 10).cast("long"), lit(width.toLong))

  /** Build the (row, col, cnt) counter table over `keyCol` occurrences
    * (NULL keys carry no frequency and are skipped). The ×depth explode
    * happens map-side and collapses immediately into ≤ depth·width
    * partial-agg groups — the shuffle is sketch-sized, not data-sized.
    */
  def sketch(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 8192): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape d=$depth w=$width")
    // fanOut: depth md5s per key occurrence is the expensive stage and
    // must not inherit a small-file scan's split count (q194 measured
    // 1.2 avg cores of 32 on a 1-split token stream); no-op on inputs
    // that already scan wide. Key rows only — the projection above the
    // repartition keeps the shuffle to the hashed column.
    Multimodal.fanOut(df.select(col(keyCol).cast("string").as("__k")))
      .filter(col("__k").isNotNull)
      .withColumn("row", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("col", bucketCol(col("row"), col("__k"), width))
      .groupBy(col("row"), col("col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two same-shape sketches: counter-wise sum. The algebraic
    * property that makes the sketch materializable per partition/day and
    * combinable later without rescanning anything.
    */
  def merge(skA: DataFrame, skB: DataFrame): DataFrame =
    skA.unionByName(skB)
      .groupBy(col("row"), col("col"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Read a sketch store written per-partition (e.g. the
    * `graft.streaming.Streams.cmsSink` batch_id layout, or per-day batch
    * sketches) and fold every partition's counters into the current
    * sketch — the n-way [[merge]]. Touches only counter rows, never raw
    * data.
    */
  def readMerged(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("row"), col("col"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for the distinct keys of `keys(keyCol)`: min over
    * sketch rows of the addressed counter (absent counter = 0). The
    * sketch side is ≤ d·w rows, so the join broadcasts; the keys side
    * can be corpus-sized. Output: (keyCol, est).
    */
  def estimateKeys(sk: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 8192): DataFrame =
    keys.select(col(keyCol)).filter(col(keyCol).isNotNull).distinct()
      .withColumn("__k", col(keyCol).cast("string"))
      .withColumn("row", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("col", bucketCol(col("row"), col("__k"), width))
      .join(sk, Seq("row", "col"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Top-k keys by CMS estimate, deterministic order (est DESC, key ASC)
    * — one sketch build + one estimate pass + a bounded TakeOrdered
    * tail. Deterministic hashes ⇒ exactly oracle-checkable (q194).
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int, depth: Int = 4,
      width: Int = 8192): DataFrame = {
    val sk = sketch(df, keyCol, depth, width)
    estimateKeys(sk, df, keyCol, depth, width)
      .orderBy(col("est").desc, col(keyCol).asc)
      .limit(k)
  }

  /** Equi-join output-size estimate from two sketches: per sketch row,
    * the counter dot product Σ_col cntA·cntB; the estimate is the
    * row-wise MIN (each row's product = exact size + non-negative
    * collision mass, so min is the tightest). One row: (est_rows).
    * Prices `a ⋈ b` from two constant-size summaries — no row of the
    * join itself is ever materialized.
    */
  def joinSizeEstimate(a: DataFrame, aKey: String, b: DataFrame,
      bKey: String, depth: Int = 4, width: Int = 8192): DataFrame = {
    val ska = sketch(a, aKey, depth, width)
      .withColumnRenamed("cnt", "__ca")
    val skb = sketch(b, bKey, depth, width)
      .withColumnRenamed("cnt", "__cb")
    val prod = ska.join(skb, Seq("row", "col"))
      .groupBy(col("row"))
      .agg(sum(col("__ca") * col("__cb")).as("__p"))
    // rows with no (row,col) overlap contribute product 0 — keep them in
    // the min via the left join, else the estimate would silently drop
    // the tightest bound
    ska.select(col("row")).distinct()
      .join(prod, Seq("row"), "left")
      .agg(min(coalesce(col("__p"), lit(0L))).as("est_rows"))
  }

  /** The CMS theory bands as an oracle-checked witness (q196):
    *
    *  - `hh_no_underestimate`: ∀ distinct keys, est ≥ exact count — a
    *    DETERMINISTIC property of the structure (every addressed counter
    *    contains the key's own mass), so it must hold for every key, not
    *    just reported ones.
    *  - `hh_over_band`: for the top-k reported keys, est ≤ exact +
    *    tolFactor·N/width (N = total key mass). Markov gives
    *    P(excess > c·N/w) ≤ (1/c)^depth per key; c=12, d=4 ⇒ 5e-5 per
    *    key — and with fixed md5 hashes the check is deterministic on
    *    fixed data, verified at every SF by the differential gate.
    *  - `join_no_underestimate` / `join_over_band`: the same two bounds
    *    for [[joinSizeEstimate]], exact = the true join count, overshoot
    *    band tolFactor·|a|·|b|/width (the collision-mass expectation is
    *    |a|·|b|/width per row).
    *
    * Output: (check_name, ok) — 4 rows, oracle asserts TRUE each.
    */
  def bandsCheck(df: DataFrame, keyCol: String, k: Int,
      a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      depth: Int = 4, width: Int = 8192,
      tolFactor: Double = 12.0): DataFrame = {
    val exact = df.select(col(keyCol).cast("string").as("__k"))
      .filter(col("__k").isNotNull)
      .groupBy(col("__k")).agg(count(lit(1)).as("__exact"))
    val est = estimateKeys(sketch(df, keyCol, depth, width), df, keyCol,
      depth, width)
      .withColumn("__k", col(keyCol).cast("string"))
    val joined = est.join(exact, Seq("__k"))
    val totals = exact.agg(sum(col("__exact")).as("__n"))
    val hhUnder = joined
      .agg(min(col("est") - col("__exact")).as("__worst"))
      .select(lit("hh_no_underestimate").as("check_name"),
        (col("__worst") >= 0).as("ok"))
    val hhOver = joined
      .orderBy(col("est").desc, col(keyCol).asc).limit(k)
      .crossJoin(totals)
      .agg(max((col("est") - col("__exact")).cast("double")
        - lit(tolFactor) * col("__n").cast("double") / width).as("__w"))
      .select(lit("hh_over_band").as("check_name"), (col("__w") <= 0).as("ok"))
    val estJoin = joinSizeEstimate(a, aKey, b, bKey, depth, width)
    val exactJoin = a.select(col(aKey).cast("string").as("__k"))
      .join(b.select(col(bKey).cast("string").as("__k")), Seq("__k"))
      .agg(count(lit(1)).as("__exact"))
    val na = a.filter(col(aKey).isNotNull).agg(count(lit(1)).as("__na"))
    val nb = b.filter(col(bKey).isNotNull).agg(count(lit(1)).as("__nb"))
    val j = estJoin.crossJoin(exactJoin).crossJoin(na).crossJoin(nb)
    val jUnder = j.select(lit("join_no_underestimate").as("check_name"),
      (col("est_rows") >= col("__exact")).as("ok"))
    val jOver = j.select(lit("join_over_band").as("check_name"),
      ((col("est_rows") - col("__exact")).cast("double")
        <= lit(tolFactor) * col("__na").cast("double") * col("__nb") / width)
        .as("ok"))
    hhUnder.unionByName(hhOver).unionByName(jUnder).unionByName(jOver)
  }
}
