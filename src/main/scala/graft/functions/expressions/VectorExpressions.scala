package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expressions for the per-pair hot loops of dedup and
  * similarity search. Both participate in whole-stage codegen (`doGenCode`
  * emits a tight primitive-array loop), so a candidate-verification stage
  * over millions of pairs runs at JIT speed instead of through the generic
  * interpreted `array_intersect` / higher-order-function paths — on a
  * 100 TB corpus the verify stage is the dominant cost of MinHash/LSH and
  * prefix-filter joins.
  *
  * The reference has no analog (its only custom scalar work is the Python
  * `get_field_id` loop, [function_app.py:233-256]); these exist for the
  * engine's LLM-pipeline extension surface.
  */

/** Size of the intersection of two SORTED array<long> set representations
  * (two-pointer merge, no allocation). Inputs must be sorted ascending and
  * duplicate-free — the contract of [[graft.ext.Dedup.hashedShingles]].
  */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_long_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
    var i = 0; var j = 0; var c = 0
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { c += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      s"""
         |long[] $x = $a.toLongArray();
         |long[] $y = $b.toLongArray();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $x.length && $j < $y.length) {
         |  if ($x[$i] == $y[$j]) { $c++; $i++; $j++; }
         |  else if ($x[$i] < $y[$j]) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature of a hashed-shingle set in ONE per-row pass: element k
  * of the result is min over the set of XXH64(shingle, seed = k). No
  * explode, no 64-way aggregation, no shuffle — the signature of a document
  * never leaves its scan task, which is the only formulation that scales to
  * a 100 TB corpus (the explode+groupBy alternative shuffles |doc|·|set|
  * rows and was measured 10× slower even locally).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData].toLongArray()
    val out = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < xs.length) {
      var k = 0
      while (k < numHashes) {
        val h = XXH64.hashLong(xs(i), k)
        if (h < out(k)) out(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xs = ctx.freshName("xs"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |long[] $xs = $a.toLongArray();
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $xs.length; $i++) {
         |  for (int $k = 0; $k < $numHashes; $k++) {
         |    long $h = $xxh.hashLong($xs[$i], (long) $k);
         |    if ($h < $out[$k]) $out[$k] = $h;
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed word-shingle set of a text column in ONE per-row pass:
  * lowercase, whitespace-tokenize, hash each token's bytes (XXH64), combine
  * each window of `n` consecutive token hashes by chaining, then sort and
  * deduplicate — returning the sorted-distinct array<long> set contract of
  * [[SortedLongIntersectSize]]. Shingle STRINGS are never materialized.
  *
  * Replaces a transform/slice/array_join/xxhash64/array_sort/array_distinct
  * higher-order-function stack that was measured at ~3 ms/document — this
  * runs at ~µs/document, which at 100 TB is the difference between shingling
  * being free at scan speed or dominating the whole dedup pipeline.
  */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.StringType
  import org.apache.spark.unsafe.types.UTF8String

  require(n >= 1, "shingle width must be >= 1")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    WordShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val util = WordShingleHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $util.compute($a, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingleHashes {
  import org.apache.spark.unsafe.Platform
  import org.apache.spark.unsafe.types.UTF8String

  /** Lowercase + whitespace-tokenize + XXH64 each token's byte range.
    * Returns (hashes, count); the array may be over-allocated.
    */
  def tokenHashes(s: UTF8String): (Array[Long], Int) = {
    val bytes = s.toLowerCase.getBytes // UTF8, lowercased like lower(col)
    var hashes = new Array[Long](16)
    var nTok = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      val start = i
      while (i < len && !isSpace(bytes(i))) i += 1
      if (i > start) {
        if (nTok == hashes.length) {
          hashes = java.util.Arrays.copyOf(hashes, nTok * 2)
        }
        hashes(nTok) = XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
        nTok += 1
      }
    }
    (hashes, nTok)
  }

  /** Single-pass tokenize + hash + shingle + sort + dedupe. */
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val (tokenHashes, nTok) = this.tokenHashes(s)
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    // 2. shingle hashes: chain n consecutive token hashes
    val m = nTok - n + 1
    val sh = new Array[Long](m)
    var p = 0
    while (p < m) {
      var h = 42L
      var j = 0
      while (j < n) { h = XXH64.hashLong(tokenHashes(p + j), h); j += 1 }
      sh(p) = h
      p += 1
    }
    // 3. sort + dedupe in place
    java.util.Arrays.sort(sh)
    var w = 0
    var r = 1
    while (r < m) {
      if (sh(r) != sh(w)) { w += 1; sh(w) = sh(r) }
      r += 1
    }
    val out = if (w + 1 == m) sh else java.util.Arrays.copyOf(sh, w + 1)
    new GenericArrayData(out)
  }

  /** \s-equivalent for the ASCII whitespace the tokenizer splits on. */
  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B
}

/** 64-bit SimHash of a text column in one per-row pass: bit i of the result
  * is the sign of Σ_tokens ±1 over bit i of the token hash (occurrences
  * weighted — duplicates count). Replaces an explode + 64-way conditional
  * aggregation: the signature never leaves the scan task.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.StringType
  import org.apache.spark.unsafe.types.UTF8String

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val util = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $util.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  import org.apache.spark.unsafe.types.UTF8String

  def compute(s: UTF8String): Long = {
    val (hashes, nTok) = WordShingleHashes.tokenHashes(s)
    val counts = new Array[Int](64)
    var i = 0
    while (i < nTok) {
      val h = hashes(i)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (counts(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }
}

/** 0-based index of the first position where two array<long> columns hold
  * the same non-null value; -1 when no position matches (positions past the
  * shorter array never match; a null element never equals anything, SQL-
  * style). The LSH tiny-universe membership predicate: per-band bucket
  * hashes ride as a small array and `first_equal_index(bks_a, bks_b) >= 0`
  * decides "would any band bucket this pair together" in ≤ bands direct
  * long compares — no banding explode, no candidate shuffle, no distinct.
  * A zip_with/array_position formulation is ~100× slower here: higher-order
  * lambdas are interpreted per element and allocate a boolean array per
  * evaluation, and this predicate runs once per loop-join pair visit.
  */
case class FirstEqualIndex(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "first_equal_index"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) return i
      i += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val res = ctx.freshName("res")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $res = -1;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getLong($i) == $b.getLong($i)) { $res = $i; break; }
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All sign-bit LSH bucket keys of an embedding in ONE per-row pass:
  * element t of the result is the `numPlanes`-bit bucket of hash table t,
  * where bit p is the sign of the projection onto deterministic
  * pseudo-random hyperplane `t*1024 + p`. Bit-identical to the Column
  * formulation it replaces (`xxhash64(lit(plane), idx)`-derived components,
  * double accumulation in element order) — but a primitive float loop
  * instead of `tables × numPlanes` interpreted zip_with/aggregate stacks
  * per row, so bucket assignment rides the scan at codegen speed. At
  * 100 TB the bucketing pass touches every corpus vector; this is the
  * difference between it being free and it dominating the candidate join.
  */
case class LshSignBuckets(child: Expression, numPlanes: Int, tables: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numPlanes >= 1 && numPlanes <= 64, "1 <= numPlanes <= 64")
  require(tables >= 1, "tables >= 1")
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_sign_buckets"

  override def nullSafeEval(input: Any): Any =
    LshSignBuckets.compute(input.asInstanceOf[ArrayData], numPlanes, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val util = LshSignBuckets.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $util.compute($a, $numPlanes, $tables);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSignBuckets {
  /** Replicates `xxhash64(lit(plane), idx).cast("double") / Long.MaxValue`
    * exactly: XxHash64's seed is 42 and int children chain via hashInt.
    */
  def compute(arr: ArrayData, numPlanes: Int, tables: Int): GenericArrayData = {
    // degenerate vectors reproduce the Column formulation exactly: an empty
    // vector's fold and a null element's product both made `proj` NULL, so
    // `when(proj >= 0, bit)` set NO bits — bucket 0 for every table
    val n = arr.numElements()
    var z = 0
    var hasNull = false
    while (z < n && !hasNull) { hasNull = arr.isNullAt(z); z += 1 }
    if (n == 0 || hasNull) return new GenericArrayData(new Array[Long](tables))
    val v = arr.toFloatArray()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < numPlanes) {
        val h0 = XXH64.hashInt(t * 1024 + p, 42L)
        var proj = 0.0
        var i = 0
        while (i < v.length) {
          proj += v(i).toDouble * (XXH64.hashInt(i, h0).toDouble / Long.MaxValue.toDouble)
          i += 1
        }
        if (proj >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Dot product of two array<float> embeddings, accumulated in double in
  * element order — a deterministic sequential fold, bit-reproducible on any
  * cluster. Codegen is a primitive float[] loop (SIMD-friendly after JIT).
  * Array elements must be non-null; lengths are zipped to the shorter.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x(i).toDouble * y(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |float[] $x = $a.toFloatArray();
         |float[] $y = $b.toFloatArray();
         |int $n = $x.length < $y.length ? $x.length : $y.length;
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $acc += (double) $x[$i] * (double) $y[$i]; }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Top-`nprobe` nearest-centroid ids of an array<float> vector by argmax
  * dot product — the IVF cell-assignment kernel ([[graft.ext.Similarity]]
  * `cellOf`). Scores accumulate in double in element order (zipped to the
  * shorter length), exactly the [[FloatVectorDot]] fold, and selection is
  * `nprobe` argmax sweeps with strict-greater comparison, so ties break on
  * the smaller centroid id and a NaN score ranks below every real score —
  * bit-identical ranking to the Column formulation it replaces
  * (`array_sort` ascending on `(-score, cid)` structs), but one primitive
  * loop per row instead of building, negating, and sorting an
  * `nlist`-element struct array through interpreted higher-order
  * functions. Cell assignment runs once per corpus row, so at auto-nlist
  * scale (up to 1024 centroids) this is the difference between the
  * assignment pass riding the scan and it dominating the job.
  *
  * Centroids are a model parameter (driver-fit, ≤ fitSample rows — the
  * same contract as the IVF fit); they ride the expression as data, reach
  * generated code via a reference object, and use `Seq` so case-class
  * structural equality (canonicalization, subexpression elimination) works.
  */
case class NearestCellIds(child: Expression, centroids: Seq[Seq[Float]], nprobe: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(centroids.nonEmpty, "centroids must be non-empty")
  require(nprobe >= 1 && nprobe <= centroids.length,
    s"1 <= nprobe <= ${centroids.length}, got $nprobe")

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cell_ids"

  @transient private lazy val cents: Array[Array[Float]] =
    centroids.map(_.toArray).toArray

  def compute(input: ArrayData): GenericArrayData = {
    val v = input.toFloatArray()
    val k = cents.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = cents(c)
      val n = math.min(v.length, cv.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v(i).toDouble * cv(i).toDouble; i += 1 }
      scores(c) = acc
      c += 1
    }
    val out = new Array[Long](nprobe)
    val used = new Array[Boolean](k)
    var r = 0
    while (r < nprobe) {
      var best = -1
      var bestScore = 0.0
      var j = 0
      while (j < k) {
        if (!used(j)) {
          val s = scores(j)
          if (best < 0 || s > bestScore ||
              (java.lang.Double.isNaN(bestScore) && !java.lang.Double.isNaN(s))) {
            best = j; bestScore = s
          }
        }
        j += 1
      }
      used(best) = true
      out(r) = best.toLong
      r += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("nearestCellIds", this, classOf[NearestCellIds].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
