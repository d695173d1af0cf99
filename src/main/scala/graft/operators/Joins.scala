package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join layer (SURVEY.md §2.4 J1-J7).
  *
  * Scale stance: dimension sides are explicitly `broadcast()` so the 100 TB
  * fact side never shuffles for an enrichment join; anti/semi joins project
  * the build side down to its key columns before joining so the existing-key
  * scan is column-pruned at the source.
  */
object Joins {

  /** J1/J2/J3/J5 — enrichment join against a (small) dimension.
    * The dim is broadcast: a map-side hash join, zero shuffle of the fact.
    */
  def enrich(fact: DataFrame, dim: DataFrame, cond: Column, how: String = "inner"): DataFrame =
    fact.join(broadcast(dim), cond, how)

  /** Key-based semi join: fact rows whose key exists in `other`. */
  def semiByKey(fact: DataFrame, other: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(other.select(keys.map(col): _*), keys, "left_semi")

  /** J6 — anti join on a composite business key: rows of `incoming` whose
    * key is absent from `existing` ([function_app.py:302-315, 375-388]).
    * Build side is pruned to the key columns only, so at scale the existing
    * fact table is scanned key-only (parquet column pruning).
    */
  def antiByKey(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*), keys, "left_anti")

  /** J7 fast path — contains-match lookup as a pure projection: the dim is
    * collected once (it is a lookup VOCABULARY — same memory contract as a
    * broadcast), sorted by `dimOrd`, and each fact row is answered in place
    * by the codegen'd [[graft.functions.expressions.FirstContainsIndex]]
    * with early exit at the first match. Zero joins, zero shuffles, fully
    * inside whole-stage codegen — strictly less work than the relational
    * form below at any scale where the dim fits in memory.
    *
    * The dim collect is guarded at [[MaxIndexedDimRows]] rows: this path is
    * for lookup VOCABULARIES (the broadcast-dim memory contract); a larger
    * dim fails fast with a pointer to [[containsLookup]], the BNLJ form
    * with no driver-side materialization.
    */
  val MaxIndexedDimRows = 100000

  def containsLookupIndexed(
      fact: DataFrame,
      dim: DataFrame,
      lookupCol: String,
      dimMatch: String,
      dimOrd: String,
      dimId: String,
      outCol: String): DataFrame = {
    // Sort with the ordinal column's NATIVE ordering (numeric ordinals must
    // not order lexicographically) by sorting in the plan, not driver-side;
    // null match values can never match and are dropped, null ordinals sort
    // last (same outcome as min_by, which never selects a null ordinal over
    // a non-null one).
    val entries = dim.select(col(dimMatch), col(dimOrd), col(dimId))
      .filter(col(dimMatch).isNotNull)
      .orderBy(col(dimOrd).asc_nulls_last)
      .limit(MaxIndexedDimRows + 1)
      .collect()
    require(entries.length <= MaxIndexedDimRows,
      s"containsLookupIndexed: dim exceeds $MaxIndexedDimRows rows — " +
        "this path collects the dim to the driver (vocabulary contract); " +
        "use containsLookup (broadcast nested-loop) for large dims")
    val needles = entries.map(_.get(0).toString.toLowerCase)
    val ids = entries.map(r => lit(r.get(2)))
    graft.functions.GraftFunctions.register(fact.sparkSession)
    val idx = graft.functions.GraftFunctions.firstContainsIndex(col(lookupCol), needles.toSeq)
    fact.withColumn(outCol,
      when(idx.isNotNull, element_at(array(ids.toSeq: _*), idx + 1))
        .otherwise(lit(null)))
  }

  /** Skew-safe equi join (extension): when a handful of join-key values
    * carry a disproportionate share of fact rows, a plain shuffle join puts
    * whole hot keys on single reducers. Salting splits each hot key into
    * `salts` sub-keys: the fact side gets a deterministic salt derived from
    * hashing its whole row (uniform, reproducible — no rand()), the build
    * side is replicated `salts` times. Same result set as a plain inner
    * join; reducer load per key drops by ~`salts`.
    *
    * Use for fact-to-MEDIUM-table joins where the build side is too big to
    * broadcast but small enough to replicate; for small dims prefer
    * [[enrich]] (broadcast beats salting), and AQE's skew-join handles the
    * sort-merge case — this is the explicit form for when you know the keys.
    */
  def saltedJoin(fact: DataFrame, build: DataFrame, keys: Seq[String], salts: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.toSeq.map(col): _*), lit(salts)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** As-of join (extension; no reference analog): for each left row, attach
    * the LATEST right row per key with right.ts <= left.ts — the
    * trade/quote pattern.
    *
    * Implementation is the scale-correct union + running-window form: tag
    * both inputs, union them, and carry the most recent right values
    * forward with `last(..., ignoreNulls) OVER (PARTITION BY keys ORDER BY
    * ts, side ROWS UNBOUNDED PRECEDING)`. ONE shuffle (the window
    * partition) regardless of input sizes — no per-row subquery, no range
    * cross join; skew only where a single key is hot.
    *
    * Right rows must be unique per (keys, tsCol) — pre-aggregate the build
    * side otherwise (ties would be non-deterministic).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        rightVals.map(c => col(c).as(s"__r_$c")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal ts => inclusive (<=) match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = rightVals.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select((left.columns.map(col) ++ rightVals.map(col)).toSeq: _*)
  }

  /** Binned range join (extension): match `points` rows to `intervals`
    * rows with start <= point < end, WITHOUT an equi key. The naive plan is
    * a broadcast-nested-loop; this implementation manufactures an equi key
    * by binning: each interval explodes into the bins it covers, points map
    * to their single bin, and a hash join on the bin plus the residual
    * range predicate replaces the cross product. `binSeconds` should be on
    * the order of the typical interval width.
    */
  def rangeJoinBinned(
      points: DataFrame,
      pointTs: String,
      intervals: DataFrame,
      startTs: String,
      endTs: String,
      binSeconds: Long,
      how: String = "inner"): DataFrame = {
    val p = points.withColumn("__bin", floor(unix_timestamp(col(pointTs)) / binSeconds))
    val iv = intervals.withColumn("__bin", explode(sequence(
      floor(unix_timestamp(col(startTs)) / binSeconds),
      floor(unix_timestamp(col(endTs)) / binSeconds))))
    p.join(iv,
        p("__bin") === iv("__bin") &&
        col(pointTs) >= col(startTs) && col(pointTs) < col(endTs),
        how)
      .drop("__bin")
  }

  /** Bloom-prefiltered semi join (extension): exact left-semi join of a
    * huge fact against a build side whose KEYS fit a bloom filter but whose
    * rows are too many to broadcast as a hash table (the gap between
    * [[enrich]]'s broadcast and a full shuffle join). The build keys are
    * aggregated ONCE into ~1.2 MB of bits per million keys at 1% fpp; the
    * probe runs inside whole-stage codegen on the fact scan, so only
    * matches-and-false-positives (rate = fpp) ever reach the shuffle for
    * the residual exact semi join. At a 0.1% match rate this cuts the
    * fact-side shuffle ~1000× while the residual join keeps the result
    * EXACTLY equal to a plain left-semi join — no false positives survive.
    *
    * Keys must be integral (probed as long). `expectedKeys` sizes the
    * filter: it is a capacity hint, not a cap — overfilling degrades fpp
    * (more residual-join input), never correctness. Spark's runtime bloom
    * pruning (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects
    * this same shape automatically; this is the explicit operator form,
    * usable when the build side is a separate job or the optimizer's
    * size thresholds don't fire.
    */
  def bloomSemiJoin(
      fact: DataFrame,
      factKey: String,
      build: DataFrame,
      buildKey: String,
      expectedKeys: Long,
      fpp: Double = 0.01): DataFrame = {
    require(expectedKeys > 0 && expectedKeys <= 100000000L,
      "bloomSemiJoin: expectedKeys must be in (0, 1e8] — beyond that the " +
        "bit array itself stops being broadcast-cheap; shuffle-join instead")
    val keys = build.select(col(buildKey).cast("long").as(buildKey))
    val bf = keys.stat.bloomFilter(buildKey, expectedKeys, fpp)
    graft.functions.GraftFunctions.register(fact.sparkSession)
    val survivors = fact.filter(
      graft.functions.GraftFunctions.bloomMightContain(col(factKey).cast("long"), bf))
    val distinctKeys = keys.distinct()
    survivors.join(distinctKeys,
      survivors(factKey).cast("long") === distinctKeys(buildKey), "left_semi")
  }

  /** J7 — contains-match lookup join ([function_app.py:233-256]:
    * `get_field_id`): for each fact row, the id of the FIRST dim row (in
    * `dimOrd` order) whose lowercased `dimMatch` value is a substring of the
    * fact's `lookupCol`; null when nothing matches.
    *
    * The reference runs this as an O(|fact|·|dim|) Python `iterrows` loop
    * per fact row — its single biggest scalability cliff (SURVEY.md §3.3).
    * Here it is a broadcast nested-loop theta join with a codegen'd
    * `lower(...).contains(...)` predicate, followed by a `min_by` tie-break
    * to recover the order-sensitive first-match semantics deterministically.
    *
    * A unique row id is attached to the fact so duplicate fact rows survive
    * the group-back (the reference's per-row `.apply` trivially preserves
    * duplicates; a groupBy over fact columns would not).
    */
  def containsLookup(
      fact: DataFrame,
      dim: DataFrame,
      lookupCol: String,
      dimMatch: String,
      dimOrd: String,
      dimId: String,
      outCol: String): DataFrame = {
    val rid = "__graft_rid"
    val d = dim.select(
      lower(col(dimMatch)).as("__m"),
      col(dimOrd).as("__o"),
      col(dimId).as("__id"))
    val withId = fact.withColumn(rid, monotonically_increasing_id())
    val joined = withId.join(broadcast(d), lower(col(lookupCol)).contains(col("__m")), "left")
    val keep = fact.columns.map(c => first(col(c)).as(c))
    joined
      .groupBy(col(rid))
      .agg(keep.head, (keep.tail :+ min_by(col("__id"), col("__o")).as(outCol)).toSeq: _*)
      .drop(rid)
  }
}
