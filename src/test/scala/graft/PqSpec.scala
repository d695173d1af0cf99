package graft

import org.apache.spark.sql.functions._
import graft.ext.{Recall, Similarity}
import graft.functions.GraftFunctions

/** Product quantization: encode determinism and nearest-centroid
  * correctness, LUT/ADC algebra against explicit math, codegen vs
  * interpreted agreement, the refine stage's exactness, and measured
  * recall floors of both composed forms on the sf0.001 corpus.
  */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  // 2 subspaces × 2 centroids × 2 dims — small enough to check by hand
  private val books: Array[Array[Array[Float]]] = Array(
    Array(Array(0f, 0f), Array(1f, 1f)),
    Array(Array(1f, 0f), Array(0f, 2f)))

  test("pqEncode picks the L2-nearest centroid per subspace; ties keep the smaller code") {
    val df = Seq(
      Tuple1(Array(0.1f, 0.2f, 0.9f, 0.1f)), // sub0 -> c0, sub1 -> c0
      Tuple1(Array(0.9f, 0.8f, 0.2f, 1.6f)), // sub0 -> c1, sub1 -> c1
      Tuple1(Array(0.5f, 0.5f, 0.1f, 1.9f))  // sub0 equidistant -> c0 (tie), sub1 -> c1
    ).toDF("v").select(GraftFunctions.pqEncode(col("v"), books).as("c"))
    val got = df.collect().map(_.getAs[Array[Byte]](0).toSeq)
    assert(got === Seq(Seq[Byte](0, 0), Seq[Byte](1, 1), Seq[Byte](0, 1)))
  }

  test("pqLut + pqAdcDot reconstruct the centroid inner product exactly") {
    val q = Array(2f, 3f, -1f, 4f)
    // lut layout: [q_sub0·c00, q_sub0·c01, q_sub1·c10, q_sub1·c11]
    val expectedLut = Seq(0.0, 5.0, -1.0, 8.0)
    val df = Seq(Tuple1(q)).toDF("qv")
      .select(GraftFunctions.pqLut(col("qv"), books).as("lut"))
    assert(df.head().getSeq[Double](0) === expectedLut)
    // codes (1, 0) must score lut[1] + lut[2] = 4.0
    val scored = Seq((Array[Byte](1, 0), q)).toDF("codes", "qv")
      .select(GraftFunctions.pqAdcDot(col("codes"),
        GraftFunctions.pqLut(col("qv"), books), 2).as("s"))
    assert(scored.head().getDouble(0) === 4.0)
  }

  test("codegen and interpreted paths agree on all three kernels") {
    val df = Seq(Tuple1(Array(0.3f, -0.7f, 1.2f, 0.4f))).toDF("v")
      .select(
        GraftFunctions.pqEncode(col("v"), books).as("c"),
        GraftFunctions.pqLut(col("v"), books).as("l"))
      .select(col("c"), col("l"),
        GraftFunctions.pqAdcDot(col("c"), col("l"), 2).as("s"))
    val wholestage = df.head()
    val interpreted = {
      val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      try df.head() finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    }
    assert(wholestage.getAs[Array[Byte]](0).toSeq ===
      interpreted.getAs[Array[Byte]](0).toSeq)
    assert(wholestage.getSeq[Double](1) === interpreted.getSeq[Double](1))
    assert(wholestage.getDouble(2) === interpreted.getDouble(2))
  }

  test("pqFit is deterministic and shapes m x ksub' x d/m") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val b1 = Similarity.pqFit(e, "vec_id", "embedding", m = 16, ksub = 64)
    val b2 = Similarity.pqFit(e, "vec_id", "embedding", m = 16, ksub = 64)
    assert(b1.length == 16)
    assert(b1.forall(_.length == b1.head.length))
    assert(b1.head.head.length == 4)
    assert(b1.map(_.map(_.toSeq).toSeq).toSeq === b2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("refine stage: rerank = corpus size makes pqTopK exactly the brute-force ranking") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
    // shortlist of 49 = every other vector: the refine re-ranks ALL
    // candidates exactly, so the output must be hash-identical to brute
    val refined = Similarity.pqTopK(e, q, "vec_id", "embedding", 5,
      m = 16, ksub = 64, rerank = 49)
    assert(rows(refined) === rows(exact))
  }

  test("recall floors: pq+refine >= 0.9, ivfpq >= 0.7 macro at sf0.001") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
    val pq = Recall.topKRecall(exact,
        Similarity.pqTopK(e, q, "vec_id", "embedding", 5,
          m = 16, ksub = 64, rerank = 50))
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(pq >= 0.9, s"pq recall $pq")
    val ivfpq = Recall.topKRecall(exact,
        Similarity.ivfPqTopK(e, q, "vec_id", "embedding", 5,
          nlist = 16, nprobe = 8, m = 16, ksub = 64, rerank = 50))
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(ivfpq >= 0.7, s"ivfpq recall $ivfpq")
  }

  test("ADC-only ordering degrades gracefully: rerank=0 still returns k ranked rows per query") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.pqTopK(e, e.filter(col("vec_id") < 3), "vec_id",
      "embedding", 5, m = 16, ksub = 64)
    val shape = out.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), sum(col("rank")).as("rs"))
      .collect()
    assert(shape.length == 3)
    assert(shape.forall(r => r.getLong(1) == 5 && r.getLong(2) == 15))
  }

  test("persisted PQ index: codebook roundtrip exact; lifecycle probe equals in-memory comparator; compact folds replay") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val even = e.filter(col("vec_id") % 2 === 0)
    val odd = e.filter(col("vec_id") % 2 === 1)
    val idx = java.nio.file.Files.createTempDirectory("graft_pq_idx").toString
    Similarity.buildPqIndex(even, "vec_id", "embedding", idx)
    val books = Similarity.pqFit(even, "vec_id", "embedding", m = 16, ksub = 64)
    val read = Similarity.readPqCodebooks(spark, idx)
    assert(read.map(_.map(_.toSeq).toSeq).toSeq === books.map(_.map(_.toSeq).toSeq).toSeq)
    Similarity.pqIndexIngest(spark, idx, odd, "vec_id", "embedding")
    Similarity.pqIndexIngest(spark, idx, odd, "vec_id", "embedding") // replay
    Similarity.pqIndexCompact(spark, idx)
    // no duplicate rows survive compaction
    val dupes = spark.read.parquet(s"$idx/codes")
      .groupBy(col("neighbor_id")).count().filter(col("count") > 1).count()
    assert(dupes == 0)
    val q = e.filter(col("vec_id") < 5)
    val fromIndex = Similarity.pqIndexTopK(spark, idx, q, "vec_id", "embedding", 5,
      rerank = 20, vectors = Some(e))
    val direct = Similarity.pqTopKWithBooks(e, q, "vec_id", "embedding", 5, books,
      rerank = 20)
    assert(rows(fromIndex) === rows(direct))
  }

  test("pqIndexTopKAuto sizes the refine from the STORED count and equals the explicit form") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft_pq_auto").toString
    Similarity.buildPqIndex(e, "vec_id", "embedding", idx)
    val q = e.filter(col("vec_id") < 3)
    val n = spark.read.parquet(s"$idx/codes").count()
    val auto = Similarity.pqIndexTopKAuto(spark, idx, q, "vec_id", "embedding",
      5, vectors = e)
    val explicit = Similarity.pqIndexTopK(spark, idx, q, "vec_id", "embedding",
      5, rerank = Similarity.autoRerank(n, 5), vectors = Some(e))
    assert(rows(auto) === rows(explicit))
    assert(auto.groupBy(col("query_id")).count()
      .filter(col("count") =!= 5).count() == 0)
  }

  test("autoNprobe holds the measured 0.75 probe fraction; ivfPqTopKAuto returns k ranked rows per query") {
    import graft.ext.Similarity.autoNprobe
    assert(autoNprobe(16) == 12)
    assert(autoNprobe(32) == 24)
    assert(autoNprobe(781) == 586)
    assert(autoNprobe(1) == 1)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.ivfPqTopKAuto(e, e.filter(col("vec_id") < 3),
      "vec_id", "embedding", 5)
    assert(out.count() == 15)
    assert(out.groupBy(col("query_id")).count()
      .filter(col("count") =!= 5).count() == 0)
  }

  test("readPqCodebooks fails loudly on an incomplete or shifted codebooks table") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft_pq_corrupt").toString
    Similarity.buildPqIndex(e, "vec_id", "embedding", idx)
    // drop one model row: a positional reassembly would silently shift
    // every higher code id in that subspace; the reader must refuse
    val pruned = spark.read.parquet(s"$idx/codebooks")
      .filter(!(col("subspace") === 3 && col("code") === 7))
      .localCheckpoint()
    pruned.coalesce(1).write.mode("overwrite").parquet(s"$idx/codebooks")
    val ex = intercept[IllegalArgumentException] {
      Similarity.readPqCodebooks(spark, idx)
    }
    assert(ex.getMessage.contains("corrupt model"))
  }

  test("persisted IVF-PQ index: lifecycle probe equals the in-memory composed form; compact folds replay; DPP prunes cells") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val even = e.filter(col("vec_id") % 2 === 0)
    val odd = e.filter(col("vec_id") % 2 === 1)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivfpq_idx").toString
    Similarity.buildIvfPqIndex(even, "vec_id", "embedding", idx, nlist = 8)
    Similarity.ivfPqIndexIngest(spark, idx, odd, "vec_id", "embedding")
    Similarity.ivfPqIndexIngest(spark, idx, odd, "vec_id", "embedding") // replay
    Similarity.ivfPqIndexCompact(spark, idx)
    val dupes = spark.read.parquet(s"$idx/codes")
      .groupBy(col("neighbor_id")).count().filter(col("count") > 1).count()
    assert(dupes == 0)
    val q = e.filter(col("vec_id") < 5)
    val fromIndex = Similarity.ivfPqIndexTopK(spark, idx, q, "vec_id",
      "embedding", 5, nprobe = 4, rerank = 20, vectors = Some(e))
    // same models in (read back from the index), row-identical out
    val direct = Similarity.ivfPqTopKWithModels(e, q, "vec_id", "embedding", 5,
      nprobe = 4, Similarity.readIvfCentroids(spark, idx),
      Similarity.readPqCodebooks(spark, idx), rerank = 20)
    assert(rows(fromIndex) === rows(direct))
    // nprobe=1 still returns k ranked rows per query (the probed cell
    // holds >= k candidates on this corpus); cell-file pruning itself is
    // exercised by the shared DPP layout (ivfIndexTopK's q200 plan audit)
    val adcOnly = Similarity.ivfPqIndexTopK(spark, idx, q, "vec_id", "embedding", 5,
      nprobe = 1)
    assert(spark.read.parquet(s"$idx/centroids").count() == 8)
    assert(adcOnly.groupBy(col("query_id")).count()
      .filter(col("count") =!= 5).count() == 0)
    // auto form: knobs derived from the index, k rows per query
    val auto = Similarity.ivfPqIndexTopKAuto(spark, idx, q, "vec_id",
      "embedding", 5, vectors = e)
    assert(auto.groupBy(col("query_id")).count()
      .filter(col("count") =!= 5).count() == 0)
  }

  test("bid generation guard: codes under a foreign codebook generation fail loudly at probe") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("graft_pq_bid").toString
    Similarity.buildPqIndex(e, "vec_id", "embedding", idx)
    // simulate the one unpreventable crash window: a retrain that swapped
    // codebooks/ but not codes/ — rewrite the model from a different fit
    // WITHOUT re-encoding
    val otherBooks = Similarity.pqFit(e.filter(col("vec_id") < 100),
      "vec_id", "embedding", m = 16, ksub = 64)
    val rows2 = otherBooks.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cent, c) => (j, c, cent.toSeq) }
    }.toSeq.toDF("subspace", "code", "centroid").localCheckpoint()
    rows2.coalesce(1).write.mode("overwrite").parquet(s"$idx/codebooks")
    val ex = intercept[Exception] {
      Similarity.pqIndexTopK(spark, idx, e.filter(col("vec_id") < 3),
        "vec_id", "embedding", 5).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(ex).contains("DIFFERENT codebook generation"), messages(ex))
    // the named repair restores one generation and the probe works again
    Similarity.pqSinkRetrainCompact(spark, idx, e, "vec_id", "embedding")
    assert(Similarity.pqIndexTopK(spark, idx, e.filter(col("vec_id") < 3),
      "vec_id", "embedding", 5).count() == 15)
  }

  test("pqSinkRetrainCompact recovers recall after an unrepresentative bootstrap") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .localCheckpoint()
    // skewed bootstrap: 50 DEGENERATE vectors (all-ones) — their fit
    // collapses every subspace to one centroid, so every later vector
    // encodes to the same code and ADC ordering carries no signal
    val skewed = e.filter(col("vec_id") < 50)
      .withColumn("embedding",
        expr("transform(embedding, x -> cast(1.0 as float))"))
    val rest = e.filter(col("vec_id") >= 50)
    val store = skewed.unionByName(rest).localCheckpoint()
    val idx = java.nio.file.Files.createTempDirectory("graft_pq_retrain").toString
    Similarity.buildPqIndex(skewed, "vec_id", "embedding", idx)
    Similarity.pqIndexIngest(spark, idx, rest, "vec_id", "embedding")
    Similarity.pqIndexIngest(spark, idx, rest, "vec_id", "embedding") // replay
    val q = e.filter(col("vec_id").between(50, 59))
    val exact = Similarity.bruteForceTopK(store, q, "vec_id", "embedding", 5)
      .localCheckpoint()
    def recall(): Double = Recall.topKRecall(exact,
        Similarity.pqIndexTopKAuto(spark, idx, q, "vec_id", "embedding", 5,
          vectors = store))
      .agg(avg(col("recall"))).head().getDouble(0)
    val before = recall()
    Similarity.pqSinkRetrainCompact(spark, idx, store, "vec_id", "embedding")
    val after = recall()
    assert(after >= 0.9, s"post-retrain recall $after")
    assert(after > before, s"retrain must improve on the skewed bootstrap: $before -> $after")
    // also a compact: the replay's duplicate code rows folded away
    val dupes = spark.read.parquet(s"$idx/codes")
      .groupBy(col("neighbor_id")).count().filter(col("count") > 1).count()
    assert(dupes == 0)
  }

  test("autoRerank follows the measured sqrt rule and floors at 4k") {
    import graft.ext.Similarity.autoRerank
    assert(autoRerank(5000, 5) == 64)
    assert(autoRerank(50000, 5) == 202)
    assert(autoRerank(500000, 5) == 637)
    assert(autoRerank(10, 5) == 20) // 4k floor dominates tiny corpora
    // pqTopKAuto on the sf0.001 corpus: rerank = max(20, ceil(0.9*sqrt(50)))
    // = 20 < corpus, exact refine of a 20-deep shortlist
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = graft.ext.Similarity.pqTopKAuto(e, e.filter(col("vec_id") < 3),
      "vec_id", "embedding", 5)
    assert(out.count() == 15)
  }
}
