package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-recipe mixing: resample a corpus so domain (source / language /
  * dataset) proportions match a target mixture — the step that turns a
  * curated corpus into a training mix ("data recipe"). Two forms:
  *
  *  - [[mixtureSample]]: the LARGEST mixture-exact downsample (no domain
  *    repeated, scarcest weighted domain consumed whole);
  *  - [[mixtureRepeats]]: epoch-style repeat factors toward a target total
  *    (scarce domains repeat, abundant domains subsample — how real recipes
  *    hit e.g. 30% code / 50% web / 20% books when the raw pools don't).
  *
  * Selection inside a domain is deterministic and engine-neutral: rank by
  * `(md5(id), id)` — the same md5-threshold convention as the q77 hash
  * sampler, so any engine reproduces the exact member set, not just the
  * proportions.
  *
  * Scale shape: the per-domain counts are a MODEL-PARAMETER collect (one
  * row per named domain in the recipe — recipes name dozens of domains,
  * not millions); the payload is projected away before any shuffle and
  * never moves; and selection is the TWO-PHASE bucketed form
  * ([[keepSmallestByHash]]) — a recipe domain can be half the corpus, so
  * no operator here ever sorts a whole domain in one window partition.
  * The quota frame is a true dim (|recipe| rows), broadcast.
  */
object Mixing {

  private def checkedWeights(weights: Map[String, Double]): Map[String, Double] = {
    require(weights.nonEmpty, "empty mixture")
    require(weights.values.forall(w => w > 0 && w.isFinite), "weights must be > 0")
    val s = weights.values.sum
    require(math.abs(s - 1.0) < 1e-9, s"weights must sum to 1, got $s")
    weights
  }

  /** Per-domain doc counts for the named domains — driver-resident recipe
    * state (≤ |recipe| rows by construction).
    */
  private def domainCounts(df: DataFrame, domainCol: String,
      weights: Map[String, Double]): Map[String, Long] = {
    val counts = df
      .filter(col(domainCol).isin(weights.keys.toSeq.map(lit(_)): _*))
      .groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = weights.keySet -- counts.keySet
    require(missing.isEmpty, s"recipe domains absent from corpus: $missing")
    counts
  }

  /** (id, domain, __h) triples for the recipe domains — the hash every
    * selection ranks on (engine-neutral md5 hex, same as the q77 sampler).
    */
  private def hashed(df: DataFrame, idCol: String, domainCol: String,
      domains: Iterable[String]): DataFrame =
    df.select(col(idCol), col(domainCol))
      .filter(col(domainCol).isin(domains.toSeq.map(lit(_)): _*))
      .withColumn("__h", md5(col(idCol).cast("string").cast("binary")))

  /** EXACT distributed rank-threshold selection without a per-domain
    * global sort: a recipe domain can be half the corpus, so
    * `row_number over (partition by domain)` would funnel half the rows
    * through ONE sort task. Instead the hash space is pre-bucketed on the
    * first two hex chars (256 buckets, consistent with the (__h, id)
    * order because the bucket IS the hash prefix): bucket counts cumsum in
    * a 256-rows-per-domain window, buckets wholly inside the threshold
    * are kept without ranking, and only the single BOUNDARY bucket —
    * ~1/256th of the domain — is row_number'd. Output is bit-identical to
    * the naive global rank (`__rk <= threshold(domain)`), which is what
    * MixingSpec and the DuckDB oracles assert.
    * `thresholds` carries (domainCol, __q); emits the kept (id, domain)
    * rows plus their `__rk` global rank.
    */
  private def keepSmallestByHash(df: DataFrame, idCol: String, domainCol: String,
      thresholds: DataFrame): DataFrame = {
    val withB = df.withColumn("__b", substring(col("__h"), 1, 2))
    val bcum = withB.groupBy(col(domainCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cumb", sum(col("__c")).over(
        Window.partitionBy(col(domainCol)).orderBy(col("__b"))))
      .join(broadcast(thresholds), Seq(domainCol))
    val j = withB.join(bcum, Seq(domainCol, "__b"))
    // bucket entirely inside the threshold: kept, rank derivable only for
    // the boundary bucket (whole-bucket keeps don't need one — callers
    // that need __rk for sub-thresholds re-enter with a smaller __q)
    val whole = j.filter(col("__cumb") <= col("__q"))
      .select(col(idCol), col(domainCol), lit(null).cast("long").as("__rk"))
    val boundary = j
      .filter(col("__cumb") > col("__q") && col("__cumb") - col("__c") < col("__q"))
      .withColumn("__rkb", row_number().over(
        Window.partitionBy(col(domainCol), col("__b")).orderBy(col("__h"), col(idCol))))
      .filter(col("__rkb") <= col("__q") - (col("__cumb") - col("__c")))
      .select(col(idCol), col(domainCol),
        (col("__rkb") + col("__cumb") - col("__c")).as("__rk"))
    whole.unionByName(boundary)
  }

  /** Largest downsample whose domain proportions EXACTLY match `weights`
    * (up to floor rounding): total `N = floor(min_d(n_d / w_d))`, per-domain
    * quota `floor(w_d · N)`, members the quota smallest by `(md5(id), id)`.
    * Domains not named in the recipe are dropped (the allowlist semantic a
    * recipe implies). Emits `(id, domain)` of the kept rows.
    */
  def mixtureSample(df: DataFrame, idCol: String, domainCol: String,
      weights: Map[String, Double]): DataFrame = {
    val w = checkedWeights(weights)
    val counts = domainCounts(df, domainCol, w)
    val nTotal = math.floor(w.map { case (d, wt) => counts(d) / wt }.min).toLong
    val quotas = w.map { case (d, wt) => d -> math.floor(wt * nTotal).toLong }
    val s = df.sparkSession
    import s.implicits._
    val qdf = quotas.toSeq.toDF(domainCol, "__q")
    keepSmallestByHash(hashed(df, idCol, domainCol, w.keys), idCol, domainCol, qdf)
      .select(col(idCol), col(domainCol))
  }

  /** Temperature-weighted domain sampling — the multilingual rebalancing
    * standard: domain d's share of a `totalBudget`-doc sample is
    * ∝ count_d^α, flattening the head without capping it to uniform
    * (α=1 is the natural distribution, α=0 uniform). α is restricted to
    * {0.25, 0.5, 0.75} because those powers factor into IEEE `sqrt` —
    * an EXACTLY-ROUNDED primitive, bit-identical in every engine —
    * where a general `pow` is libm-dependent:
    *
    *   n^0.25 = sqrt(sqrt(n));  n^0.5 = sqrt(n);
    *   n^0.75 = sqrt(n) · sqrt(sqrt(n))
    *
    * (each sqrt correctly rounded and the one product once-rounded, so
    * the composition is a deterministic function of n in any IEEE-754
    * engine — DuckDB reproduces the micro-unit weights exactly, which is
    * what the q163/q164 oracles assert). With the weight micro-units
    * wμ_d = floor(n_d^α·10⁶ + 0.5) the whole budget derivation is
    * engine-exact INTEGER arithmetic:
    *
    *   budget_d = min(n_d, (2·T·wμ_d + Wμ) div (2·Wμ)),  Wμ = Σ wμ_d
    *
    * (the integer form of floor(T·w/W + 0.5) — no doubles past the
    * sqrts, no rounding ties). The division runs in BigInt: 2·T·wμ
    * overflows a Long once T·wμ exceeds 2⁶² (a 1 M-doc domain at α=0.75
    * has wμ ≈ 3.2·10¹⁰, so a multi-billion-token budget would silently
    * go negative in Long math) — |domains| BigInt divisions on the
    * driver cost nothing. Domain weights are |domains| driver scalars
    * (the recipe-frame contract shared by the other mixtures); selection
    * is the exact bucketed rank-threshold, so no domain ever sorts whole
    * in one window partition. Emits the kept (id, domain) rows.
    */
  def temperatureSample(df: DataFrame, idCol: String, domainCol: String,
      totalBudget: Long, alpha: Double = 0.5): DataFrame = {
    require(totalBudget > 0, "totalBudget must be positive")
    val npow: Double => Double = alpha match {
      case 0.25 => n => math.sqrt(math.sqrt(n))
      case 0.5  => n => math.sqrt(n)
      case 0.75 => n => math.sqrt(n) * math.sqrt(math.sqrt(n))
      case a => throw new IllegalArgumentException(
        s"alpha must be one of 0.25, 0.5, 0.75 (sqrt-exact powers), got $a")
    }
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureSample: empty corpus")
    val wu = counts.map { case (d, n) =>
      d -> math.floor(npow(n.toDouble) * 1e6 + 0.5).toLong }
    val wt = BigInt(wu.values.sum)
    val quotas = counts.map { case (d, n) =>
      d -> math.min(n,
        ((BigInt(2) * totalBudget * wu(d) + wt) / (BigInt(2) * wt)).toLong) }
    val s = df.sparkSession
    import s.implicits._
    val qdf = quotas.toSeq.toDF(domainCol, "__q")
    keepSmallestByHash(hashed(df, idCol, domainCol, counts.keys), idCol, domainCol, qdf)
      .select(col(idCol), col(domainCol))
  }

  /** Token-budget mixture: real recipes weight domains by TOKENS, not
    * docs. Each domain gets budget `floor(w_d · targetTokens)` and takes
    * its hash-ranked docs while tokens remain (the doc crossing the
    * boundary is included, so every non-zero budget takes at least one
    * doc; a domain whose pool is smaller than its budget is consumed
    * whole). One running-sum window per domain over `(id, domain,
    * n_tokens)` triples — the payload never enters the shuffle, no driver
    * collect at all. Emits `(id, domain, n_tokens)` of the kept docs.
    *
    * `tokenCount` is summed in LONG (a corpus-scale token total overflows
    * int); rows whose token count is NULL are excluded from both the
    * budget accounting and the output — an unknown length can neither
    * spend budget nor be charged for it. Callers wanting a different
    * policy coalesce before the call.
    */
  def mixtureTokenSample(df: DataFrame, idCol: String, domainCol: String,
      tokenCount: org.apache.spark.sql.Column, weights: Map[String, Double],
      targetTokens: Long): DataFrame = {
    require(targetTokens > 0, "targetTokens must be > 0")
    val w = checkedWeights(weights)
    val s = df.sparkSession
    import s.implicits._
    val bdf = w.toSeq.map { case (d, wt) =>
      (d, math.floor(wt * targetTokens).toLong) }.toDF(domainCol, "__q")
    // same two-phase bucket selection as keepSmallestByHash, with the
    // bucket statistic a token SUM instead of a row count: whole buckets
    // under the budget skip the running-sum window entirely; only the
    // boundary bucket (~1/256th of the domain) windows row-by-row.
    val withB = df
      .select(col(idCol), col(domainCol), tokenCount.cast("long").as("n_tokens"))
      .filter(col("n_tokens").isNotNull)
      .filter(col(domainCol).isin(w.keys.toSeq.map(lit(_)): _*))
      .withColumn("__h", md5(col(idCol).cast("string").cast("binary")))
      .withColumn("__b", substring(col("__h"), 1, 2))
    val bcum = withB.groupBy(col(domainCol), col("__b"))
      .agg(sum(col("n_tokens").cast("long")).as("__c"))
      .withColumn("__cumb", sum(col("__c")).over(
        Window.partitionBy(col(domainCol)).orderBy(col("__b"))))
      .join(broadcast(bdf), Seq(domainCol))
    val j = withB.join(bcum, Seq(domainCol, "__b"))
    val whole = j.filter(col("__cumb") <= col("__q"))
      .select(col(idCol), col(domainCol), col("n_tokens"))
    val boundary = j
      .filter(col("__cumb") > col("__q") && col("__cumb") - col("__c") < col("__q"))
      .withColumn("__cumr", sum(col("n_tokens").cast("long")).over(
        Window.partitionBy(col(domainCol), col("__b")).orderBy(col("__h"), col(idCol))))
      .filter(col("__cumr") - col("n_tokens") + (col("__cumb") - col("__c")) < col("__q"))
      .select(col(idCol), col(domainCol), col("n_tokens"))
    whole.unionByName(boundary)
  }

  /** Top-p (nucleus) corpus selection per domain: rank each domain's rows
    * by `(scoreCol DESC, idCol ASC)` and keep the SHORTEST prefix whose
    * cumulative `weightCol` reaches `pPct` percent of the domain's total
    * weight — "the best documents that make up 80% of the tokens", the
    * quality-ordered cousin of the hash-ordered mixtures above (those
    * flatten domain SKEW; this trims each domain's quality TAIL). A row is
    * kept iff `100·(weight before it) < pPct·(domain total)` — the
    * crossing row is included, so every non-empty domain keeps at least
    * one row, and the rule is exact integer arithmetic (no share doubles,
    * no ties).
    *
    * Scale shape — same two-phase selection as [[mixtureTokenSample]], but
    * bucketed by the SCORE (scores live in [0,1] by the quality-score
    * contract; `floor(score·256)` clamped to 255 is order-consistent with
    * the score sort because equal scores share a bucket): per-(domain,
    * bucket) weight sums cumulate top-down in a ≤256-rows-per-domain
    * window, buckets wholly inside the budget are kept without ranking,
    * buckets wholly past it are dropped without ranking, and ONLY the one
    * boundary bucket runs a row-level running-sum window. No domain ever
    * sorts whole in one window partition. Output is bit-identical to the
    * naive global-window form, which is what the DuckDB oracle asserts.
    *
    * Rows with NULL or non-positive weight are excluded: they cannot
    * spend budget, and zero-weight rows would turn the strict-< prefix
    * rule's whole-bucket shortcut into an off-by-one. Rows with a NULL
    * or NaN score are excluded for the same reason (no rank, no budget —
    * NaN would also rank inconsistently across the sort and the
    * `floor(score·256)` bucket cast, which sends NaN to bucket 0 while
    * the sort puts it above every double). Callers wanting to keep them
    * coalesce/clamp before the call. Emits `(id, domain, weight)` of the
    * kept rows.
    *
    * Degenerate score distributions (constant or heavily quantized
    * scores — e.g. every row scoring 1.0 after a boolean gate) collapse a
    * whole domain into ONE score bucket, so a boundary bucket LARGER than
    * `boundaryWindowRows` (gate read off the bucket-level counts — no
    * extra pass; smaller buckets run the one row-level window directly,
    * keeping the common case at the pre-hardening cost) gets the SAME
    * two-phase treatment again instead of one row-level window:
    * sub-chunks keyed by `(exact score, integer-id range chunk)` — both
    * components order-consistent with the `(score DESC, id ASC)` row
    * order, the id chunk by truncating division of the id by a range-
    * derived width (monotone for positive widths, ≤ ~512 chunks) —
    * cumulate at chunk level, and only the ONE crossing chunk (~1/256th
    * of the tie group) runs a row-level running-sum window. For
    * non-integral id types the id chunk degenerates to one chunk per
    * exact score: quantized scores still chunk, but a CONSTANT-score
    * domain with string ids falls back to the row-level window
    * (documented limitation; integral ids — the norm — stay bounded).
    */
  def topPByWeight(df: DataFrame, idCol: String, domainCol: String,
      scoreCol: String, weightCol: String, pPct: Int,
      boundaryWindowRows: Int = 1 << 16): DataFrame = {
    require(pPct >= 1 && pPct <= 100, s"pPct must be in [1, 100], got $pPct")
    require(boundaryWindowRows >= 1, "boundaryWindowRows must be >= 1")
    val rows = df
      .select(col(idCol), col(domainCol),
        col(scoreCol).cast("double").as("__s"),
        col(weightCol).cast("long").as("__w"))
      .filter(col("__w") > 0 && col("__s").isNotNull && !isnan(col("__s")))
      .withColumn("__b", least(lit(255), floor(col("__s") * 256)).cast("int"))
    val bcum = rows.groupBy(col(domainCol), col("__b"))
      .agg(sum(col("__w")).as("__bw"), count(lit(1)).as("__bn"))
      .withColumn("__cumw", sum(col("__bw")).over(
        Window.partitionBy(col(domainCol)).orderBy(col("__b").desc)))
    val tot = rows.groupBy(col(domainCol)).agg(sum(col("__w")).as("__tot"))
    // tot is |domains| rows — broadcast like the mixtures' recipe frames.
    // b2 is |domains|·≤256 rows: small here, but it SCALES with the domain
    // count (a web corpus keyed by site has millions), so the bucket-level
    // join carries no hint — AQE picks broadcast when it actually fits.
    val b2 = bcum.join(broadcast(tot), Seq(domainCol))
    // Materialized ONCE (localCheckpoint, the Dedup/Graph discipline): the
    // whole/boundary/recursion branches below are a UNION whose subtrees
    // each re-derive their input in a lazy plan — without this, the
    // caller's upstream (often a full scan + feature scoring) re-executes
    // per branch (measured on q172: 2.1-2.5 s warm vs ~1 s with the
    // checkpoint). The frame is the NARROW projection (id, domain, score,
    // weight + 4 bucket-level longs) — one shuffle-sized footprint, the
    // same price the selection's own window shuffle already pays.
    val j = rows.join(b2, Seq(domainCol, "__b")).localCheckpoint()
    // whole-kept: even the bucket's LAST row (weight ≥ 1, so its
    // cum-before ≤ __cumw − 1) satisfies the strict rule
    val whole = j.filter(lit(100) * col("__cumw") <= col("__tot") * pPct)
      .select(col(idCol), col(domainCol), col("__w").as("weight"))
    // ---- boundary bucket: recurse the two-phase selection (see scaladoc).
    // Exactly ONE bucket per domain crosses the budget (weights positive,
    // cum strictly increasing), so per-domain offsets below are constants.
    val crossing = j
      .filter(lit(100) * col("__cumw") > col("__tot") * pPct &&
        lit(100) * (col("__cumw") - col("__bw")) < col("__tot") * pPct)
    // Engage-gate (round-10 verdict: the unconditional recursion tripled
    // the common case): the chunk recursion exists for DEGENERATE score
    // distributions that collapse a domain into one huge bucket. The
    // bucket's ROW count is already computed in the bucket-level agg, so
    // buckets at or under `boundaryWindowRows` rows take the direct
    // row-level window — its partition IS the bucket (one crossing bucket
    // per domain), bounded by the threshold — and only larger buckets pay
    // the second cumulate. Same (score DESC, id ASC) residual order both
    // ways, so output stays bit-identical to the naive global window.
    val smallBoundary = crossing.filter(col("__bn") <= boundaryWindowRows)
      .withColumn("__wb", coalesce(sum(col("__w")).over(
        Window.partitionBy(col(domainCol))
          .orderBy(col("__s").desc, col(idCol).asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(lit(100) * (col("__cumw") - col("__bw") + col("__wb")) <
        col("__tot") * pPct)
      .select(col(idCol), col(domainCol), col("__w").as("weight"))
    val boundary0 = crossing.filter(col("__bn") > boundaryWindowRows)
    // Existence probe on the checkpointed blocks (limit-1 scan, one cheap
    // job): when NO crossing bucket exceeds the gate — the overwhelmingly
    // common shape — the chunk-recursion subtree is omitted from the plan
    // entirely instead of executing as three empty-input shuffles. The
    // probe is a driver-side scalar over already-materialized narrow
    // blocks, not a collect of data.
    if (boundary0.isEmpty) return whole.unionByName(smallBoundary)
    val idIsIntegral = df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    val withChunk =
      if (idIsIntegral) {
        // id range chunks: width from div-by-256 endpoints (overflow-safe
        // for any long range); truncating `div` is monotone for positive
        // widths, so chunks are contiguous intervals of the id order
        val stats = boundary0.groupBy(col(domainCol))
          .agg(min(col(idCol).cast("long")).as("__idmin"),
            max(col(idCol).cast("long")).as("__idmax"))
        boundary0.join(broadcast(stats), Seq(domainCol))
          .withColumn("__idl", col(idCol).cast("long"))
          .withColumn("__wd", expr("(__idmax div 256) - (__idmin div 256) + 1"))
          .withColumn("__c", expr("(__idl div __wd) - (__idmin div __wd)"))
      } else boundary0.withColumn("__c", lit(0L))
    // chunk-level cumulate over (score DESC, chunk ASC) — the coarsened
    // row order; __off (weight in the buckets before this one) is constant
    // per domain, min() just carries it through the agg
    val ccum = withChunk.groupBy(col(domainCol), col("__s"), col("__c"))
      .agg(sum(col("__w")).as("__cw"),
        min(col("__cumw") - col("__bw")).as("__off"))
      .withColumn("__cumc", sum(col("__cw")).over(
        Window.partitionBy(col(domainCol)).orderBy(col("__s").desc, col("__c").asc)))
    val j2 = withChunk.select(col(idCol), col(domainCol), col("__s"),
        col("__w"), col("__c"), col("__tot"))
      .join(ccum, Seq(domainCol, "__s", "__c"))
    // whole-kept chunks: same ≥1-weight argument as whole-kept buckets
    val wholeChunks = j2
      .filter(lit(100) * (col("__off") + col("__cumc")) <= col("__tot") * pPct)
      .select(col(idCol), col(domainCol), col("__w").as("weight"))
    // the ONE crossing chunk: row-level running sum, ordered id ASC (all
    // rows in a chunk share the exact score, so id is the full residual
    // order) — partition size ≈ tie-group/256, never a whole domain
    val boundary = j2
      .filter(lit(100) * (col("__off") + col("__cumc")) > col("__tot") * pPct &&
        lit(100) * (col("__off") + col("__cumc") - col("__cw")) < col("__tot") * pPct)
      .withColumn("__wb", coalesce(sum(col("__w")).over(
        Window.partitionBy(col(domainCol), col("__s"), col("__c"))
          .orderBy(col(idCol).asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(lit(100) * (col("__off") + col("__cumc") - col("__cw") + col("__wb")) <
        col("__tot") * pPct)
      .select(col(idCol), col(domainCol), col("__w").as("weight"))
    whole.unionByName(smallBoundary).unionByName(wholeChunks).unionByName(boundary)
  }

  /** Epoch-style repeat factors toward `targetTotal` rows at the target
    * mixture: domain quota `floor(w_d · targetTotal)` spread as
    * `quota / n_d` repeats for every doc plus one extra for the
    * `quota mod n_d` first-ranked docs. A domain with quota < n_d
    * subsamples (repeats 0/1), a scarce domain repeats (2, 3, …) — the
    * upsampling a real recipe needs when raw pools don't match the mix.
    * Emits every recipe-domain row with its `n_repeats` (0 = dropped), the
    * audit artifact a mix run ships.
    */
  def mixtureRepeats(df: DataFrame, idCol: String, domainCol: String,
      weights: Map[String, Double], targetTotal: Long): DataFrame = {
    require(targetTotal > 0, "targetTotal must be > 0")
    val w = checkedWeights(weights)
    val counts = domainCounts(df, domainCol, w)
    val plan = w.map { case (d, wt) =>
      val quota = math.floor(wt * targetTotal).toLong
      val n = counts(d)
      (d, quota / n, quota % n)
    }.toSeq
    val s = df.sparkSession
    import s.implicits._
    val pdf = plan.toDF(domainCol, "__base", "__rem")
    val h = hashed(df, idCol, domainCol, w.keys)
    // the rem-smallest rows per domain get the +1 — the same bucketed
    // selection as mixtureSample (no full-domain sort), left-joined back
    val extra = keepSmallestByHash(h,
        idCol, domainCol, pdf.select(col(domainCol), col("__rem").as("__q")))
      .select(col(idCol), col(domainCol), lit(1L).as("__x"))
    h.select(col(idCol), col(domainCol))
      .join(broadcast(pdf.select(col(domainCol), col("__base"))), Seq(domainCol))
      .join(extra, Seq(idCol, domainCol), "left")
      .select(col(idCol), col(domainCol),
        (col("__base") + coalesce(col("__x"), lit(0L))).as("n_repeats"))
  }

  /** Weighted sampling WITHOUT replacement, k rows per domain — the
    * Efraimidis–Spirakis A-ES scheme: each row draws a uniform u and is
    * ranked by `u^(1/w)` descending (equivalently `ln(u)/w`, the form
    * computed here — one log beats a pow, and the monotone map keeps the
    * order identical). The top k per domain are a distribution-exact
    * weighted sample: P(row first) = w_i/Σw, then recursively on the
    * remainder. Unlike [[mixtureSample]] (uniform within domain, exact
    * quota), this weights every ROW — quality-score-proportional corpus
    * selection, where a doc twice as good should be twice as likely.
    *
    * Engine-neutral determinism: u is NOT a PRNG draw but
    * `(int(md5(id)[0:13 hex]) + 0.5) / 2^52` — the md5-threshold
    * convention extended to a numeric uniform. Both factors are exactly
    * representable doubles (≤53 bits; division by 2^52 is exact), so any
    * engine computes the identical u, and the DuckDB oracle reproduces
    * the exact member set. (`ln` is the one libm call; engines may differ
    * in the last ulp, which could flip a selection only if two keys land
    * within ~1e-16 of each other AND of the k-th threshold — md5-derived
    * u's never do.)
    *
    * Scale shape: a domain can be half the corpus, so there is no
    * per-domain global sort. Phase 1 takes the top k per (domain,
    * 256-way id-hash salt) — window partitions are ~n/256 and the global
    * top k is a subset of the per-salt top k's by pigeonhole; phase 2
    * ranks the ≤256·k survivors per domain. Bit-identical to the naive
    * single-window form (MixingSpec asserts it). Rows with NULL or
    * non-positive weight are excluded (no mass, no ticket). Emits
    * `(id, domain, weight)` of the kept rows.
    */
  def weightedReservoir(df: DataFrame, idCol: String, domainCol: String,
      weightCol: String, k: Int, salts: Int = 256): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val rows = df
      .select(col(idCol), col(domainCol),
        col(weightCol).cast("double").as("__w"))
      .filter(col("__w") > 0 && !isnan(col("__w")))
      .withColumn("__u",
        (conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 13),
          16, 10).cast("long") + lit(0.5)) / lit(4503599627370496.0))
      .withColumn("__key", log(col("__u")) / col("__w"))
    val local = rows
      .withColumn("__salt", pmod(xxhash64(col(idCol)), lit(salts)))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(domainCol), col("__salt"))
          .orderBy(col("__key").desc, col(idCol).asc)))
      .filter(col("__rk") <= k)
    local
      .withColumn("__rk2", row_number().over(
        Window.partitionBy(col(domainCol))
          .orderBy(col("__key").desc, col(idCol).asc)))
      .filter(col("__rk2") <= k)
      .select(col(idCol), col(domainCol), col("__w").cast("long").as("weight"))
  }
}
