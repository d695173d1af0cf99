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
}
