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
  * ([[Similarity]]'s k-means and PQ fits): TRAINING is driver-side over a
  * bounded, hash-spread sample — logistic regression is a few thousand
  * labeled examples, never corpus-scale — and INFERENCE is one
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

  /** Fit by full-batch gradient descent with L2 regularization on a
    * bounded driver-side sample: the `sampleN` rows with the smallest
    * (xxhash64(id), id) — hash-spread, uncorrelated with id order — from
    * `docs`, labeled by the boolean `labelCol`. A model fit, not a data
    * pass: the collect is ≤ sampleN rows regardless of corpus size.
    */
  def fit(docs: DataFrame, idCol: String, textCol: String, labelCol: String,
      dim: Int = 4096, sampleN: Int = 1024, iters: Int = 2000,
      learningRate: Double = 1.0, l2: Double = 0.0,
      featScale: Double = 50.0): LogRegModel = {
    require(dim >= 1 && sampleN >= 1 && iters >= 1, "bad hyperparameters")
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
