package graft

import org.apache.spark.sql.functions._
import graft.ext.Cms

/** Count-min sketch: collision-free exactness at generous width, the
  * deterministic no-underestimate property under collisions, counter
  * mergeability, heavy-hitter ranking, and the join-size inner product.
  */
class CmsSpec extends SparkTestBase {
  import spark.implicits._

  // 5 keys with distinct frequencies 10,20,30,40,50 (total 150)
  private def freqDf = (1 to 5).flatMap(i =>
    Seq.fill(i * 10)(s"k$i")).toDF("k")

  test("generous width: every point estimate is exact; narrow width never underestimates") {
    val wide = Cms.estimateKeys(Cms.sketch(freqDf, "k", 4, 65536), freqDf, "k", 4, 65536)
      .as[(String, Long)].collect().toMap
    assert(wide === Map("k1" -> 10L, "k2" -> 20L, "k3" -> 30L, "k4" -> 40L, "k5" -> 50L))
    // width 2: massive collisions; estimates must still dominate exact
    val narrow = Cms.estimateKeys(Cms.sketch(freqDf, "k", 4, 2), freqDf, "k", 4, 2)
      .as[(String, Long)].collect().toMap
    assert(narrow.forall { case (k, est) => est >= wide(k) })
    assert(narrow.values.forall(_ <= 150L)) // row total caps any counter
  }

  test("merge of split sketches equals the sketch of the union") {
    val (left, right) = ((1 to 5).flatMap(i => Seq.fill(i * 5)(s"k$i")),
      (1 to 5).flatMap(i => Seq.fill(i * 5)(s"k$i")))
    val merged = Cms.merge(
      Cms.sketch(left.toDF("k"), "k", 4, 64),
      Cms.sketch(right.toDF("k"), "k", 4, 64))
    val direct = Cms.sketch(freqDf, "k", 4, 64)
    assert(merged.as[(Int, Long, Long)].collect().toSet ===
      direct.as[(Int, Long, Long)].collect().toSet)
  }

  test("heavyHitters ranks by estimate with deterministic ties") {
    val top = Cms.heavyHitters(freqDf, "k", 3, 4, 65536)
      .as[(String, Long)].collect().toSeq
    assert(top === Seq(("k5", 50L), ("k4", 40L), ("k3", 30L)))
  }

  test("joinSizeEstimate: exact at generous width, sandwiched under collisions") {
    // orders-like: key i appears i times on side a, once on side b for i<=3
    val a = (1 to 5).flatMap(i => Seq.fill(i)(i.toLong)).toDF("ka")
    val b = Seq(1L, 2L, 3L, 9L).toDF("kb")
    val exact = 1L + 2L + 3L // keys 1,2,3 match with multiplicities
    val wide = Cms.joinSizeEstimate(a, "ka", b, "kb", 4, 65536)
      .as[Long].head()
    assert(wide === exact)
    val narrow = Cms.joinSizeEstimate(a, "ka", b, "kb", 4, 4)
      .as[Long].head()
    assert(narrow >= exact && narrow <= 15L * 4L) // ≤ Σa·Σb trivially
  }

  test("bandsCheck: all four guarantees hold on a collision-heavy shape") {
    val a = (1 to 50).flatMap(i => Seq.fill(3)(i.toLong)).toDF("ka")
    val b = (26 to 75).map(_.toLong).toDF("kb")
    val checks = Cms.bandsCheck(freqDf, "k", 3, a, "ka", b, "kb",
      depth = 4, width = 32)
      .as[(String, Boolean)].collect().toMap
    assert(checks.size === 4 && checks.values.forall(identity), checks.toString)
  }

  test("null keys carry no mass") {
    val df = Seq(Some("x"), None, Some("x"), None).toDF("k")
    val est = Cms.estimateKeys(Cms.sketch(df, "k", 4, 64), df, "k", 4, 64)
      .as[(String, Long)].collect().toMap
    assert(est === Map("x" -> 2L))
  }

  test("cmsSink maintains the materialized sketch across micro-batches; readMerged recovers exact counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_cms_sink").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_cms_cp").toString
    val input = MemoryStream[String]
    val q = graft.streaming.Streams.cmsSink(
      input.toDS().toDF("k"), "k", s"$dir/t", cp, depth = 4, width = 65536)
    try {
      input.addData("a", "a", "b")
      q.processAllAvailable()
      input.addData("a", "b", "c")
      q.processAllAvailable()
      val merged = Cms.readMerged(spark, s"$dir/t")
      val est = Cms.estimateKeys(merged,
        Seq("a", "b", "c", "zzz").toDF("k"), "k", 4, 65536)
        .as[(String, Long)].collect().toMap
      // generous width: batch sketches merged across partitions are exact
      assert(est === Map("a" -> 3L, "b" -> 2L, "c" -> 1L, "zzz" -> 0L))
      // two batch_id partitions on disk, each sketch-sized
      val parts = spark.read.parquet(s"$dir/t")
        .select("batch_id").distinct().as[Long].collect().toSet
      assert(parts === Set(0L, 1L))
    } finally q.stop()
  }
}
