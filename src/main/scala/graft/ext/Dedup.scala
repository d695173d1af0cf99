package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Deduplication operators for LLM training-data pipelines.
  *
  * Five families, all shuffle-conscious:
  *  - exact (hash groupBy — one shuffle on a 16-byte key, not the payload)
  *  - n-gram Jaccard (exact pairwise via shingle-inverted-index join)
  *  - MinHash + LSH banding (approximate candidates + exact verify)
  *  - SimHash (64-bit signature, hamming-ball buckets)
  *  - embedding cosine near-dup (see [[Similarity]])
  *
  * The exact pairwise path is quadratic per shingle bucket; the MinHash/LSH
  * and SimHash paths are the 100 TB-scale route: candidate generation is one
  * shuffle on band keys, verification only touches candidate pairs.
  */
object Dedup {

  /** Exact dedup: group documents by content hash; emit the canonical keep
    * id (smallest), the duplicate count, and the hash. Shuffles 16-byte md5
    * keys + ids only — never the document payload.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_dups"))

  /** Exact dedup keep-one: one representative row per distinct content. */
  def exactDedupe(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Exact word-n-gram Jaccard similarity: all pairs with
    * jaccard >= threshold, (id_a < id_b). EXACT result, computed with
    * PPJoin-style prefix filtering so it scales:
    *
    *  1. global shingle document-frequency order (rarest first);
    *  2. each doc indexes only its first `|d| - ceil(t*|d|) + 1` shingles
    *     in that order — the *prefix*. Any pair with J >= t must share at
    *     least one prefix shingle (pigeonhole on the common total order),
    *     so the candidate join touches rare shingles only and the
    *     Σ df(shingle)² blow-up on stopword-like shingles disappears;
    *  3. size-compatibility filter: J >= t ⇒ t*|a| <= |b| <= |a|/t;
    *  4. exact verification of candidates on the full shingle sets.
    *
    * jaccard = |A∩B| / (|A|+|B|-|A∩B|) is a ratio of small integers, so the
    * double value is bit-exact and reproducible across engines.
    *
    * Shuffles: one groupBy for df-counts, one window by doc id (docs are
    * small), one equi-join on prefix shingles, two hash joins to fetch the
    * full sets for verification — all key-partitioned, no cross join.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    // Hash-partition the corpus by id before shingling: a single parquet
    // file otherwise pins the (CPU-heavy, recomputed-per-branch) shingle
    // extraction to one task. At cluster scale the scan is already
    // multi-partition and this is one cheap narrow-ish shuffle of raw text.
    val shingled = df.repartition(col(idCol)).select(
      col(idCol).as("id"),
      hashedShingles(col(textCol), n).as("sh"))
      .withColumn("sh_size", size(col("sh")))
      .filter(col("sh_size") > 0)
    val inv = shingled.select(col("id"), col("sh_size"), explode(col("sh")).as("s"))
    // Global rarity order; ties broken by the shingle hash itself → total order.
    val dfreq = inv.groupBy("s").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df").asc, col("s").asc)
    val prefix = inv.join(dfreq, Seq("s"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("sh_size") - ceil(col("sh_size") * lit(threshold)) + 1)
    val a = prefix.select(col("s"), col("id").as("id_a"), col("sh_size").as("sz_a"))
    val b = prefix.select(col("s"), col("id").as("id_b"), col("sh_size").as("sz_b"))
    val candidates = a.join(b, Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("sz_b") >= ceil(col("sz_a") * lit(threshold)) &&
              col("sz_a") >= ceil(col("sz_b") * lit(threshold)))
      .select("id_a", "id_b").distinct()
    val full = shingled.select(col("id"), col("sh"))
    candidates
      .join(full.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(full.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("common", GraftFunctions.sortedIntersectSize(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("common").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Deterministic 64-bit hash family: member k of the family applied to
    * column c. xxhash64 is a native codegen'd Catalyst expression.
    */
  private def hashK(c: Column, k: Int): Column = xxhash64(lit(k), c)

  /** Shingle set as a sorted, distinct array<long> of xxhash64 values —
    * the compact set representation every pairwise stage runs on. 8 bytes
    * per shingle instead of a ~20-byte string: smaller shuffles, and the
    * intersection is a codegen'd two-pointer merge
    * ([[graft.functions.expressions.SortedLongIntersectSize]]) instead of
    * a generic interpreted array_intersect. 64-bit collisions inside one
    * document pair (~|d|²/2⁶⁴) are negligible.
    */
  def hashedShingles(text: Column, n: Int): Column =
    array_sort(array_distinct(transform(
      TextAnalysis.wordShingles(text, n), s => xxhash64(s))))

  /** MinHash signatures: for each document, `numHashes` minima over its
    * shingle set. One explode + one groupBy (single shuffle); signature is
    * an array<bigint> of fixed width.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, n: Int, numHashes: Int): DataFrame = {
    val inv = df.repartition(col(idCol))
      .select(col(idCol).as("id"), explode(hashedShingles(col(textCol), n)).as("s"))
    val mins = (0 until numHashes).map(k => min(hashK(col("s"), k)).as(s"h$k"))
    inv.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numHashes).map(k => col(s"h$k")): _*).as("sig"))
  }

  /** MinHash + LSH banding: split the signature into `bands` bands of
    * r = numHashes/bands rows; documents sharing any band bucket become
    * candidate pairs; candidates are verified with exact n-gram Jaccard.
    *
    * Probability a pair with true Jaccard j becomes a candidate:
    * 1 - (1 - j^r)^bands — with 64 hashes / 16 bands (r=4) the S-curve
    * crosses ~0.5 at j≈0.5, which suits near-dup thresholds 0.7-0.9.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      verifyThreshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = minhashSignatures(df, idCol, textCol, n, numHashes)
    val banded = sig.select(
      col("id"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(lit("band"), b, array_join(slice(col("sig"), b * r + 1, lit(r)), ",")))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val rgt = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candidates = l.join(rgt, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // exact verify on candidates only (codegen'd sorted-merge intersection)
    GraftFunctions.register(df.sparkSession)
    val shingled = df.repartition(col(idCol))
      .select(col(idCol).as("vid"), hashedShingles(col(textCol), n).as("vsh"))
    candidates
      .join(shingled.withColumnsRenamed(Map("vid" -> "id_a", "vsh" -> "sh_a")), Seq("id_a"))
      .join(shingled.withColumnsRenamed(Map("vid" -> "id_b", "vsh" -> "sh_b")), Seq("id_b"))
      .withColumn("common", GraftFunctions.sortedIntersectSize(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("common").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .filter(col("jaccard") >= verifyThreshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash: 64-bit signature whose bit i is the sign of Σ_token ±1 over
    * bit i of xxhash64(token). Near-dups differ in few bits (hamming).
    * Implemented as 64 conditional sums in ONE hash aggregation — stays in
    * codegen, one shuffle on the doc id.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"), explode(TextAnalysis.tokens(lower(col(textCol)))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$i")
    }
    val agg = tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs within `maxHamming` bits, blocked by 16-bit
    * chunks (pigeonhole: pairs within k bits share at least one of k+1
    * chunks — standard simhash blocking, avoids the all-pairs join).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "blocking uses 4 x 16-bit chunks => hamming <= 3")
    val sig = simhash(df, idCol, textCol)
    val chunked = sig.select(
      col("id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnsRenamed(Map("pos" -> "chunk", "col" -> "key"))
    val l = chunked.select(col("chunk"), col("key"), col("id").as("id_a"), col("simhash").as("sig_a"))
    val r = chunked.select(col("chunk"), col("key"), col("id").as("id_b"), col("simhash").as("sig_b"))
    l.join(r, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
