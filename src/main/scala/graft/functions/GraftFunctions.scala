package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

import graft.functions.expressions.{BloomMightContainLong, CdcChunksExpr, FirstContainsIndex, FirstEqualIndex, FloatVectorDot, LshSignBuckets, MinHashSignature, NearestCellIds, HashedBowScore, NormalizeText, PqAdcDot, PqEncode, PqLut, SimHash64, SortedLongIntersectSize, Sq8DotDecoded, Sq8Encode, StringArrayExcludeSet, WordShingleHashes}

/** Registry for the engine's native Catalyst expressions.
  *
  * Two entry styles, both idiomatic Spark:
  *  - `GraftFunctions.register(spark)` — imperative, used by the engine's
  *    own operators (self-registering at first use);
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` — the
  *    SparkSessionExtensions route for external sessions, which also makes
  *    the functions available to pure-SQL users.
  */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_sorted_intersect_size" -> (args => SortedLongIntersectSize(args(0), args(1))),
    "graft_float_dot" -> (args => FloatVectorDot(args(0), args(1))),
    // minhash(set, numHashes): second arg must be a foldable int literal
    "graft_minhash" -> (args => MinHashSignature(args(0),
      evalInt(args(1), "graft_minhash numHashes"))),
    // word_shingle_hashes(text, n): n must be a foldable int literal
    "graft_word_shingle_hashes" -> (args => WordShingleHashes(args(0),
      evalInt(args(1), "graft_word_shingle_hashes n"))),
    "graft_simhash" -> (args => SimHash64(args(0))),
    "graft_first_equal_index" -> (args => FirstEqualIndex(args(0), args(1))),
    // lsh_sign_buckets(vec, numPlanes, tables): ints must be foldable literals
    "graft_lsh_sign_buckets" -> (args => LshSignBuckets(args(0),
      evalInt(args(1), "graft_lsh_sign_buckets numPlanes"),
      evalInt(args(2), "graft_lsh_sign_buckets tables"))),
    // first_contains_index(haystack, array('needle1', ...)): second arg must
    // be a foldable array<string> literal (the lowercased dim vocabulary)
    "graft_first_contains_index" -> (args => FirstContainsIndex(args(0), {
      evalFolded(args(1), "graft_first_contains_index needles") match {
        case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
          arr.toArray[org.apache.spark.unsafe.types.UTF8String](
            org.apache.spark.sql.types.StringType).map(_.toString)
        case other => analysisError(
          s"graft_first_contains_index needles must be array<string>, got $other")
      }
    })),
    // string_array_exclude_set(toks, array('hot1', ...)): second arg must
    // be a foldable array<string> literal (the collected Zipf head)
    "graft_string_array_exclude_set" -> (args => StringArrayExcludeSet(args(0), {
      evalFolded(args(1), "graft_string_array_exclude_set exclude") match {
        case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
          arr.toArray[org.apache.spark.unsafe.types.UTF8String](
            org.apache.spark.sql.types.StringType).map(_.toString).toSeq
        case other => analysisError(
          s"graft_string_array_exclude_set exclude must be array<string>, got $other")
      }
    })),
    // nearest_cell_ids(vec, centroids, nprobe): centroids must be a foldable
    // array<array<float>> literal (the driver-fit IVF model), nprobe an int
    "graft_nearest_cell_ids" -> (args =>
      NearestCellIds(args(0),
        evalFloatMatrix(args(1), "graft_nearest_cell_ids centroids"),
        evalInt(args(2), "graft_nearest_cell_ids nprobe"))),
    // sq8_encode(vec, mins, scales) / sq8_dot(a, b, mins, scales): the grid
    // arrays must be foldable array<double> literals (model parameters)
    "graft_sq8_encode" -> (args =>
      Sq8Encode(args(0), evalDoubleArray(args(1), "graft_sq8_encode mins"),
        evalDoubleArray(args(2), "graft_sq8_encode scales"))),
    "graft_sq8_dot" -> (args =>
      Sq8DotDecoded(args(0), args(1), evalDoubleArray(args(2), "graft_sq8_dot mins"),
        evalDoubleArray(args(3), "graft_sq8_dot scales"))),
    // pq_encode(vec, codebooks) / pq_lut(vec, codebooks) /
    // pq_adc_dot(codes, lut, ksub): the codebook cube must be a foldable
    // array<array<array<float>>> literal (the driver-fit PQ model), ksub an
    // int literal matching the codebook's per-subspace centroid count
    "graft_pq_encode" -> (args =>
      PqEncode(args(0), evalFloatCube(args(1), "graft_pq_encode codebooks"))),
    "graft_pq_lut" -> (args =>
      PqLut(args(0), evalFloatCube(args(1), "graft_pq_lut codebooks"))),
    "graft_pq_adc_dot" -> (args =>
      PqAdcDot(args(0), args(1), evalInt(args(2), "graft_pq_adc_dot ksub"))),
    // cdc_chunks(text, boundaryHexDigits): content-defined chunk array
    "graft_cdc_chunks" -> (args =>
      CdcChunksExpr(args(0), evalInt(args(1), "graft_cdc_chunks boundaryHexDigits"))),
    // hashed_bow_score(text, weights, bias): the model must be foldable
    // literals (array<double> weights, double bias)
    "graft_hashed_bow_score" -> (args =>
      HashedBowScore(args(0),
        evalDoubleArray(args(1), "graft_hashed_bow_score weights").toSeq,
        evalFolded(args(2), "graft_hashed_bow_score bias") match {
          case d: Double => d
          case other => analysisError(
            s"graft_hashed_bow_score bias must be a DOUBLE literal, got $other")
        })),
    // normalize_text(text, form): form must be a foldable string literal
    "graft_normalize_text" -> (args =>
      NormalizeText(args(0), evalFolded(args(1), "graft_normalize_text form") match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => analysisError(
          s"graft_normalize_text form must be a STRING literal, got $other")
      })),
    // bloom_might_contain(key, serializedFilter): the filter rides the call
    // as a foldable binary literal (BloomFilter.writeTo bytes) so the
    // function is reachable from pure SQL too
    "graft_bloom_might_contain" -> (args =>
      BloomMightContainLong(args(0), {
        val bytes = evalFolded(args(1), "graft_bloom_might_contain filter") match {
          case b: Array[Byte] => b
          case other => analysisError(
            s"graft_bloom_might_contain filter must be a BINARY literal, got $other")
        }
        org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(bytes))
      })))

  /** Plan-time validation for model-parameter arguments: these functions
    * bake hyperparameters into the generated code, so the argument must be
    * a non-null foldable literal — a column reference would otherwise
    * surface as an obscure NPE/ClassCastException from `eval(null)`.
    */
  private def analysisError(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INTERNAL_ERROR", messageParameters = Map("message" -> msg))

  private def evalFolded(e: Expression, what: String): Any = {
    if (!e.foldable) analysisError(
      s"$what must be a literal (foldable) value, got expression: ${e.sql}")
    val v = e.eval(null)
    if (v == null) analysisError(s"$what must not be NULL")
    v
  }

  private def evalInt(e: Expression, what: String): Int =
    evalFolded(e, what) match {
      case i: Int => i
      case other => analysisError(s"$what must be an INT literal, got $other")
    }

  private def evalDoubleArray(e: Expression, what: String): Array[Double] =
    evalFolded(e, what) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toDoubleArray()
      case other => analysisError(s"$what must be array<double>, got $other")
    }

  private def evalFloatMatrix(e: Expression, what: String): Seq[Seq[Float]] =
    evalFolded(e, what) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until a.numElements()).map(i => a.getArray(i).toFloatArray().toSeq)
      case other => analysisError(s"$what must be array<array<float>>, got $other")
    }

  private def evalFloatCube(e: Expression, what: String): Seq[Seq[Seq[Float]]] =
    evalFolded(e, what) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until a.numElements()).map { j =>
          val sub = a.getArray(j)
          (0 until sub.numElements()).map(c => sub.getArray(c).toFloatArray().toSeq)
        }
      case other =>
        analysisError(s"$what must be array<array<array<float>>>, got $other")
    }

  def register(spark: SparkSession): Unit = synchronized {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      if (!registry.functionExists(FunctionIdentifier(name))) {
        registry.registerFunction(
          FunctionIdentifier(name),
          new ExpressionInfo(classOf[GraftExtensions].getName, name),
          builder)
      }
    }
  }

  /** Intersection size of two sorted, distinct array<long> columns. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    call_function("graft_sorted_intersect_size", a, b)

  /** Dot product of two array<float> columns, double accumulator. */
  def floatDot(a: Column, b: Column): Column =
    call_function("graft_float_dot", a, b)

  /** MinHash signature (array<long>, length numHashes) of a hashed set. */
  def minhash(set: Column, numHashes: Int): Column =
    call_function("graft_minhash", set, org.apache.spark.sql.functions.lit(numHashes))

  /** Sorted-distinct hashed word-n-gram shingle set of a text column. */
  def wordShingleHashes(text: Column, n: Int): Column =
    call_function("graft_word_shingle_hashes", text, org.apache.spark.sql.functions.lit(n))

  /** 64-bit SimHash of a text column (occurrence-weighted token bits). */
  def simhash64(text: Column): Column = call_function("graft_simhash", text)

  /** 0-based first index where two array<long> columns agree; -1 if none. */
  def firstEqualIndex(a: Column, b: Column): Column =
    call_function("graft_first_equal_index", a, b)

  /** Per-table sign-bit LSH bucket keys (array<long>, length `tables`). */
  def lshSignBuckets(vec: Column, numPlanes: Int, tables: Int): Column =
    call_function("graft_lsh_sign_buckets", vec,
      org.apache.spark.sql.functions.lit(numPlanes),
      org.apache.spark.sql.functions.lit(tables))

  /** Top-`nprobe` nearest-centroid ids (array<long>) by argmax dot. */
  def nearestCellIds(vec: Column, cents: Array[Array[Float]], nprobe: Int): Column =
    call_function("graft_nearest_cell_ids", vec,
      org.apache.spark.sql.functions.typedLit(cents.map(_.toSeq).toSeq),
      org.apache.spark.sql.functions.lit(nprobe))

  /** Tokens of `toks` not in `exclude`, input order preserved (O(1) hash
    * probe per token — the pruneHotTokens rewrite kernel). */
  def stringArrayExcludeSet(toks: Column, exclude: Seq[String]): Column =
    call_function("graft_string_array_exclude_set", toks,
      org.apache.spark.sql.functions.typedLit(exclude))

  /** 0-based index of the first needle contained in lower(haystack). */
  def firstContainsIndex(haystack: Column, needlesLower: Seq[String]): Column =
    call_function("graft_first_contains_index", haystack,
      org.apache.spark.sql.functions.array(
        needlesLower.map(org.apache.spark.sql.functions.lit): _*))

  private def dlit(xs: Array[Double]): Column =
    org.apache.spark.sql.functions.typedLit(xs)

  /** SQ8-encode an array<float> vector on the given per-dimension grid. */
  def sq8Encode(vec: Column, mins: Array[Double], scales: Array[Double]): Column =
    call_function("graft_sq8_encode", vec, dlit(mins), dlit(scales))

  /** Dot product of two SQ8 codes, decoded on the fly (same grid). */
  def sq8Dot(a: Column, b: Column, mins: Array[Double], scales: Array[Double]): Column =
    call_function("graft_sq8_dot", a, b, dlit(mins), dlit(scales))

  private def cubeLit(books: Array[Array[Array[Float]]]): Column =
    org.apache.spark.sql.functions.typedLit(
      books.map(_.map(_.toSeq).toSeq).toSeq)

  /** PQ-encode an array<float> vector to m one-byte codes (binary). */
  def pqEncode(vec: Column, books: Array[Array[Array[Float]]]): Column =
    call_function("graft_pq_encode", vec, cubeLit(books))

  /** Per-query flattened ADC lookup table (array<double>, m*ksub). */
  def pqLut(vec: Column, books: Array[Array[Array[Float]]]): Column =
    call_function("graft_pq_lut", vec, cubeLit(books))

  /** ADC score: sum_j lut[j*ksub + codes[j]]. */
  def pqAdcDot(codes: Column, lut: Column, ksub: Int): Column =
    call_function("graft_pq_adc_dot", codes, lut,
      org.apache.spark.sql.functions.lit(ksub))

  /** Content-defined chunk array of a text column (md5 boundary rule). */
  def cdcChunks(text: Column, boundaryHexDigits: Int): Column =
    call_function("graft_cdc_chunks", text,
      org.apache.spark.sql.functions.lit(boundaryHexDigits))

  /** Linear hashed-BoW text score: sigmoid(bias + sum w[h(tok) mod D]/n). */
  def hashedBowScore(text: Column, weights: Array[Double], bias: Double): Column =
    call_function("graft_hashed_bow_score", text, dlit(weights),
      org.apache.spark.sql.functions.lit(bias))

  /** Unicode-normalize a string column (form: NFC/NFD/NFKC/NFKD). */
  def normalizeText(text: Column, form: String): Column =
    call_function("graft_normalize_text", text,
      org.apache.spark.sql.functions.lit(form))

  /** Bloom membership probe of a long key (false = definitely absent). */
  def bloomMightContain(key: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    call_function("graft_bloom_might_contain", key,
      org.apache.spark.sql.functions.lit(bos.toByteArray))
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
