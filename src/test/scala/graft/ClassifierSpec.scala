package graft

import org.apache.spark.sql.functions._
import graft.ext.Classifier
import graft.functions.GraftFunctions
import graft.functions.expressions.WordShingleHashes

/** Hashed-BoW linear classifier: scoring algebra against hand-computed
  * hashes, codegen vs interpreted agreement, deterministic training, and
  * held-out recovery of a known linear separator on the sf0.001 corpus.
  */
class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  test("scoreCol: uniform weights make every non-empty text score sigmoid(bias + w)") {
    // sum w[h(t) mod D] / nTok == w0 when all weights equal w0
    val model = Classifier.LogRegModel(Array.fill(64)(0.7), bias = -0.2)
    val out = Seq("a b c", "one two three four five", "x")
      .toDF("text")
      .select(Classifier.scoreCol(col("text"), model).as("s"))
      .collect().map(_.getDouble(0))
    val expected = 1.0 / (1.0 + math.exp(-0.5))
    out.foreach(s => assert(math.abs(s - expected) < 1e-12))
  }

  test("scoreCol: single token hits exactly floorMod(xxh64(token), dim); empty text scores sigmoid(bias)") {
    val dim = 128
    val (hashes, n) = WordShingleHashes.tokenHashes(
      org.apache.spark.unsafe.types.UTF8String.fromString("spark"))
    assert(n == 1)
    val bucket = java.lang.Math.floorMod(hashes(0), dim.toLong).toInt
    val w = new Array[Double](dim)
    w(bucket) = 2.5
    val model = Classifier.LogRegModel(w, bias = 0.0)
    val scores = Seq("spark", "SPARK", "").toDF("text")
      .select(Classifier.scoreCol(col("text"), model).as("s"))
      .collect().map(_.getDouble(0))
    val hit = 1.0 / (1.0 + math.exp(-2.5))
    assert(math.abs(scores(0) - hit) < 1e-12)
    // tokenizer lowercases — the hashed feature space is case-folded
    assert(math.abs(scores(1) - hit) < 1e-12)
    assert(scores(2) === 0.5) // sigmoid(bias=0)
  }

  test("codegen and interpreted paths agree") {
    val model = Classifier.LogRegModel(
      Array.tabulate(32)(i => (i % 7) * 0.3 - 0.9), bias = 0.1)
    val df = Seq("the quick brown fox", "", "agg join scan")
      .toDF("text").select(Classifier.scoreCol(col("text"), model).as("s"))
    val ws = df.collect().map(_.getDouble(0)).toSeq
    val interp = {
      val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      try df.collect().map(_.getDouble(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    }
    assert(ws === interp)
  }

  test("fit is deterministic: identical weights across runs") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("label", length(col("text")) > 250)
    val m1 = Classifier.fit(d, "doc_id", "text", "label", iters = 50)
    val m2 = Classifier.fit(d, "doc_id", "text", "label", iters = 50)
    assert(m1.weights.toSeq === m2.weights.toSeq)
    assert(m1.bias === m2.bias)
  }

  test("recovers a known linear separator from hashed features: holdout accuracy >= 0.95") {
    val tk = graft.ext.TextAnalysis.tokens(lower(col("text")))
    val labeled = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"),
        (size(filter(tk, t => t === "window")) >
          size(filter(tk, t => t === "scan"))).as("label"))
    val train = labeled.filter(pmod(col("doc_id"), lit(2)) === 0)
    val hold = labeled.filter(pmod(col("doc_id"), lit(2)) === 1)
    val model = Classifier.fit(train, "doc_id", "text", "label")
    val acc = Classifier.score(hold, "doc_id", "text", model)
      .join(hold.select(col("doc_id"), col("label")), "doc_id")
      .agg(avg(when(col("predicted") === col("label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.95, s"holdout accuracy $acc")
  }

  // The underfit fixture the distributed path exists for: ~1.3% positive
  // rate AND each positive carries one of 37 rare marker tokens, so a
  // 1024-row driver sample sees only a handful of markers — holdout
  // positives with unseen markers can only score like negatives. The
  // full-corpus fit sees every marker. Periods 75 (positives) and 37
  // (markers) are chosen coprime with the even/odd train split so both
  // splits carry positives over the FULL marker vocabulary.
  private def markerFixture = {
    import spark.implicits._
    (0L until 20000L).map { i =>
      val pos = i % 75 == 0
      val base = s"common filler words shared by every document number ${i % 7}"
      (i, if (pos) s"$base marker${(i / 75) % 37}" else base, pos)
    }.toDF("doc_id", "text", "label")
  }

  test("driver-capped sample measurably underfits the rare-marker fixture; distributed fit recovers") {
    val all = markerFixture
    val train = all.filter(pmod(col("doc_id"), lit(2)) === 0)
    val hold = all.filter(pmod(col("doc_id"), lit(2)) === 1)
    def posRecall(m: Classifier.LogRegModel): Double =
      Classifier.score(hold, "doc_id", "text", m)
        .join(hold.select(col("doc_id"), col("label")), "doc_id")
        .filter(col("label"))
        .agg(avg(when(col("predicted"), 1.0).otherwise(0.0)))
        .head().getDouble(0)
    // driver regime: 1024 hash-spread rows -> ~10 positives -> most
    // holdout markers unseen. (Accuracy would hide this at 1% base rate;
    // positive recall is the honest metric.)
    val driverModel = Classifier.fit(train, "doc_id", "text", "label",
      iters = 300)
    val driverRecall = posRecall(driverModel)
    assert(driverRecall < 0.6,
      s"fixture must make the driver sample underfit, got recall $driverRecall")
    // distributed regime (sampleN > driverSampleCap routes to
    // fitDistributed): full-corpus gradient sees every marker. Default
    // iteration count — rare features at a 1.3% positive rate need the
    // full schedule to outgrow the class-prior bias.
    val distModel = Classifier.fit(train, "doc_id", "text", "label",
      sampleN = Int.MaxValue)
    val distRecall = posRecall(distModel)
    assert(distRecall >= 0.95, s"distributed fit recall $distRecall")
  }

  test("fitDistributed is deterministic and the hash-thresholded sub-sample trains") {
    val all = markerFixture
    val m1 = Classifier.fitDistributed(all, "doc_id", "text", "label", iters = 20)
    val m2 = Classifier.fitDistributed(all, "doc_id", "text", "label", iters = 20)
    assert(m1.weights.toSeq === m2.weights.toSeq && m1.bias === m2.bias)
    // sampleN below the corpus count engages the hash threshold and
    // still yields a trainable (non-degenerate) model
    val sub = Classifier.fitDistributed(all, "doc_id", "text", "label",
      sampleN = 5000, iters = 20)
    assert(sub.weights.exists(_ != 0.0))
  }

  test("fitDistributed driver dispatch is bit-identical to the per-iteration-job route") {
    // the dispatch collects the featurized sample with partition
    // boundaries and row order intact and replays the same per-partition
    // accumulation + partition-order combine — the weights must match on
    // RAW doubles, not within a tolerance
    val all = markerFixture
    val driverRoute = Classifier.fitDistributed(
      all, "doc_id", "text", "label", iters = 25)
    spark.conf.set("spark.graft.classifier.driverFitRows", "0")
    val jobRoute =
      try Classifier.fitDistributed(all, "doc_id", "text", "label", iters = 25)
      finally spark.conf.unset("spark.graft.classifier.driverFitRows")
    assert(driverRoute.weights.toSeq === jobRoute.weights.toSeq)
    assert(driverRoute.bias === jobRoute.bias)
  }
}
