package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.functions.expressions.WordShingleHashes

/** In-pipeline trained linear text classifier — the "quality filter"
  * component of web-corpus curation (the CCNet / GPT-3-WebText /
  * fastText-filter lineage: train a cheap linear model on a labeled
  * sample, then score and gate the WHOLE corpus with it).
  *
  * Architecture follows the engine's model-parameter contract
  * ([[Similarity]]'s k-means and PQ fits): TRAINING defaults to
  * driver-side over a bounded, hash-spread sample — logistic regression
  * is usually a few thousand labeled examples — with a DISTRIBUTED
  * full-batch-gradient path ([[fitDistributed]], engaged by
  * `sampleN > driverSampleCap`) for corpora whose signal needs more
  * labeled rows than a driver heap holds; INFERENCE is one
  * distributed scan with the weight vector riding a codegen'd expression
  * ([[graft.functions.expressions.HashedBowScore]]): no shuffle, no join,
  * tokenizer-speed scoring of 100 TB. Features are L1-normalized hashed
  * bag-of-words (XXH64 token hash mod `dim` — the hashing trick; identical
  * code path in trainer and scorer, so train/serve skew is impossible).
  *
  * Training is fully deterministic: the sample is ordered by
  * (xxhash64(id), id), full-batch gradient descent accumulates
  * sequentially in that order, no RNG — the same corpus always yields the
  * same weights, bit-for-bit, on any cluster.
  *
  * The reference has no analog (its pipeline is imputation ETL,
  * [function_app.py:1-403]); this is part of the engine's LLM-pipeline
  * extension surface.
  */
object Classifier {

  /** Fitted model: `weights(f)` is the coefficient of hashed feature f,
    * margin = bias + Σ w[h(tok) mod dim] / nTok.
    */
  final case class LogRegModel(weights: Array[Double], bias: Double) {
    def dim: Int = weights.length
  }

  /** Deterministic sparse featurization of one text: hashed-token counts,
    * L1-normalized. Shared by [[fit]]; [[score]] applies the same
    * tokenize+hash inside the expression.
    */
  private def featurize(text: String, dim: Int): Array[(Int, Double)] = {
    val (hashes, nTok) = WordShingleHashes.tokenHashes(
      org.apache.spark.unsafe.types.UTF8String.fromString(text))
    if (nTok == 0) return Array.empty
    val counts = new java.util.TreeMap[Int, Int]()
    var i = 0
    while (i < nTok) {
      val f = java.lang.Math.floorMod(hashes(i), dim.toLong).toInt
      counts.merge(f, 1, Integer.sum)
      i += 1
    }
    val out = new Array[(Int, Double)](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = (e.getKey, e.getValue.toDouble / nTok)
      j += 1
    }
    out
  }

  /** Fit by full-batch gradient descent with L2 regularization. Two
    * regimes behind one API, switched on `sampleN` vs `driverSampleCap`:
    *
    *  - `sampleN <= driverSampleCap` (the default): DRIVER fit on a
    *    bounded sample — the `sampleN` rows with the smallest
    *    (xxhash64(id), id) — hash-spread, uncorrelated with id order.
    *    A model fit, not a data pass: the collect is ≤ sampleN rows
    *    regardless of corpus size.
    *  - `sampleN > driverSampleCap`: DISTRIBUTED fit — the gradient of
    *    each full-batch iteration is computed cluster-side over a
    *    persisted featurized sample ([[fitDistributed]]), so corpora
    *    whose signal needs more labeled rows than a driver heap holds
    *    (e.g. a 1% positive class spread over a large marker
    *    vocabulary) can train on them. Pass `sampleN = Int.MaxValue`
    *    to train on every labeled row.
    *
    * Both regimes are deterministic (no RNG; the distributed gradient
    * is combined in partition-index order) and serve the identical
    * scoring representation.
    */
  def fit(docs: DataFrame, idCol: String, textCol: String, labelCol: String,
      dim: Int = 4096, sampleN: Int = 1024, iters: Int = 2000,
      learningRate: Double = 1.0, l2: Double = 0.0,
      featScale: Double = 50.0, driverSampleCap: Int = 1024): LogRegModel = {
    require(dim >= 1 && sampleN >= 1 && iters >= 1, "bad hyperparameters")
    if (sampleN > driverSampleCap)
      return fitDistributed(docs, idCol, textCol, labelCol, dim, sampleN,
        iters, learningRate, l2, featScale)
    val sample = docs
      .filter(col(labelCol).isNotNull && col(textCol).isNotNull)
      .orderBy(xxhash64(col(idCol)).asc, col(idCol).asc)
      .limit(sampleN)
      .select(col(textCol).cast("string"), col(labelCol).cast("boolean"))
      .collect()
      .map(r => (featurize(r.getString(0), dim).map { case (f, x) =>
        // internal conditioning only: L1-normalized tf margins are
        // O(1/nTok), too flat for full-batch GD — train on scaled
        // features and fold the scale back into the served weights, so
        // the serving representation (plain tf) is unchanged
        (f, x * featScale)
      }, if (r.getBoolean(1)) 1.0 else 0.0))
    require(sample.nonEmpty, "Classifier.fit: no training rows")
    val n = sample.length
    val w = new Array[Double](dim)
    var b = 0.0
    for (_ <- 1 to iters) {
      val grad = new Array[Double](dim)
      var gradB = 0.0
      sample.foreach { case (feats, y) =>
        var margin = b
        feats.foreach { case (f, x) => margin += w(f) * x }
        val p = 1.0 / (1.0 + math.exp(-margin))
        val resid = p - y
        feats.foreach { case (f, x) => grad(f) += resid * x }
        gradB += resid
      }
      var f = 0
      while (f < dim) {
        w(f) -= learningRate * (grad(f) / n + l2 * w(f))
        f += 1
      }
      b -= learningRate * gradB / n
    }
    LogRegModel(w.map(_ * featScale), b)
  }

  /** The distributed full-batch GD regime of [[fit]]: featurize the
    * hash-selected sample ONCE cluster-side and persist it, then run the
    * same update rule with each iteration's gradient computed as one job
    * over the cached partitions. Iteration cost is a scan of the cached
    * featurized rows (sparse int/double arrays, no text), so `iters` is
    * the wall-clock knob; the weight vector (dim doubles) rides each
    * task's closure.
    *
    * Sampling: an exact global smallest-`sampleN` selection would
    * serialize the sample through one partition (Spark's global limit),
    * so this regime hash-THRESHOLDS instead — rows with
    * `pmod(xxhash64(id), corpusCount) < sampleN` — selecting
    * approximately `sampleN` deterministic hash-spread rows while the
    * scan stays fully parallel. `sampleN >= corpusCount` selects every
    * labeled row.
    *
    * Determinism: per-partition partial gradients accumulate row-order
    * sequentially, are collected WITH their partition index, and are
    * combined on the driver in index order — same corpus, same
    * partitioning, same weights, independent of task scheduling.
    */
  def fitDistributed(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int = 4096, sampleN: Int = Int.MaxValue,
      iters: Int = 2000, learningRate: Double = 1.0, l2: Double = 0.0,
      featScale: Double = 50.0): LogRegModel = {
    require(dim >= 1 && sampleN >= 1 && iters >= 1, "bad hyperparameters")
    val labeled = docs
      .filter(col(labelCol).isNotNull && col(textCol).isNotNull)
    val total = labeled.count()
    require(total > 0, "Classifier.fitDistributed: no training rows")
    val sampled =
      if (sampleN >= total) labeled
      else labeled.filter(
        pmod(xxhash64(col(idCol)), lit(total)) < lit(sampleN.toLong))
    val featurized = sampled
      .select(col(textCol).cast("string"), col(labelCol).cast("boolean"))
      .rdd.mapPartitions(_.map { r =>
        val fx = featurize(r.getString(0), dim)
        (fx.map(_._1), fx.map(_._2 * featScale),
          if (r.getBoolean(1)) 1.0 else 0.0)
      })
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = featurized.count().toDouble
    require(n > 0, "Classifier.fitDistributed: empty hash-thresholded sample")
    // REGIME DISPATCH (the connectedComponents/driverBpeTrain pattern):
    // each full-batch iteration below is ONE Spark job over the cached
    // sample — at iters=500 that is 500 driver-sequential scheduling
    // round-trips even when the featurized sample is a few thousand rows.
    // Under the bounded-collect cap the sample is pulled ONCE with its
    // partition boundaries and row order intact, and the identical update
    // rule runs on the driver: per-partition partials accumulate row-order
    // sequentially into their own arrays and combine in partition-index
    // order — the exact FP operation sequence of the distributed route, so
    // the weights are bit-identical (ClassifierSpec asserts route equality
    // on the raw doubles). Samples above the cap — the regime this path
    // exists for — run the per-iteration jobs unchanged.
    val driverCap = docs.sparkSession.conf
      .getOption("spark.graft.classifier.driverFitRows")
      .map(_.toLong).getOrElse(131072L)
    if (n <= driverCap) {
      val parts = featurized
        .mapPartitionsWithIndex((pid, it) => Iterator.single((pid, it.toArray)))
        .collect().sortBy(_._1).map(_._2)
      featurized.unpersist(false): Unit
      val w = new Array[Double](dim)
      var b = 0.0
      for (_ <- 1 to iters) {
        val grad = new Array[Double](dim + 1)
        parts.foreach { rows =>
          val g = new Array[Double](dim + 1)
          rows.foreach { case (fs, xs, y) =>
            var margin = b
            var i = 0
            while (i < fs.length) { margin += w(fs(i)) * xs(i); i += 1 }
            val resid = 1.0 / (1.0 + math.exp(-margin)) - y
            i = 0
            while (i < fs.length) { g(fs(i)) += resid * xs(i); i += 1 }
            g(dim) += resid
          }
          var f = 0
          while (f <= dim) { grad(f) += g(f); f += 1 }
        }
        var f = 0
        while (f < dim) {
          w(f) -= learningRate * (grad(f) / n + l2 * w(f))
          f += 1
        }
        b -= learningRate * grad(dim) / n
      }
      return LogRegModel(w.map(_ * featScale), b)
    }
    val w = new Array[Double](dim)
    var b = 0.0
    for (_ <- 1 to iters) {
      val wCap = w.clone() // task-shipped snapshot of this iteration
      val bCap = b
      // grad layout: [0, dim) feature grads, [dim] bias grad
      val partials = featurized.mapPartitionsWithIndex { (pid, it) =>
        val g = new Array[Double](dim + 1)
        it.foreach { case (fs, xs, y) =>
          var margin = bCap
          var i = 0
          while (i < fs.length) { margin += wCap(fs(i)) * xs(i); i += 1 }
          val resid = 1.0 / (1.0 + math.exp(-margin)) - y
          i = 0
          while (i < fs.length) { g(fs(i)) += resid * xs(i); i += 1 }
          g(dim) += resid
        }
        Iterator.single((pid, g))
      }.collect().sortBy(_._1)
      val grad = new Array[Double](dim + 1)
      partials.foreach { case (_, g) =>
        var f = 0
        while (f <= dim) { grad(f) += g(f); f += 1 }
      }
      var f = 0
      while (f < dim) {
        w(f) -= learningRate * (grad(f) / n + l2 * w(f))
        f += 1
      }
      b -= learningRate * grad(dim) / n
    }
    featurized.unpersist(false): Unit
    LogRegModel(w.map(_ * featScale), b)
  }

  /** Score column: `sigmoid(bias + Σ w[h(tok) mod dim] / nTok)` of a text
    * column — one codegen'd pass, no shuffle (the distributed half of the
    * component; see [[graft.functions.expressions.HashedBowScore]]).
    */
  def scoreCol(text: Column, model: LogRegModel): Column =
    GraftFunctions.hashedBowScore(text, model.weights, model.bias)

  /** Convenience: (id, score, predicted) for every document. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: LogRegModel): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol),
      scoreCol(col(textCol), model).as("score"))
      .withColumn("predicted", col("score") >= 0.5)
  }
}
