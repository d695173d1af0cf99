package graft

/** Bucketed-layout co-located join: writing both fact tables bucketed on
  * the join key lets a later sort-merge join run with ZERO shuffle — the
  * 100 TB answer for recurring fact-to-fact joins (SCALING.md).
  */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  /** Count shuffle exchanges in the (post-execution, AQE-final) plan. */
  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // finalize the adaptive plan
    val s = df.queryExecution.executedPlan.toString
    "Exchange (hash|range)partitioning".r.findAllIn(s).length
  }

  test("join of two tables bucketed on the key plans no shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS buckdb LOCATION '$wh'")
    try {
      val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
      a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("buckdb.fact_a")
      b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("buckdb.fact_b")
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("buckdb.fact_a").join(spark.table("buckdb.fact_b"), "k")
        assert(joined.count() == 1000)
        assert(countShuffles(joined) == 0, "bucketed join must not shuffle")
        // contrast: the same join over unbucketed data shuffles both sides
        assert(countShuffles(a.join(b, "k")) > 0)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS buckdb CASCADE")
    }
  }

  test("writeRangeLayout: disjoint per-file key ranges, sorted rows, stable count") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_range").toString + "/t"
    // keys arrive shuffled (hash-scrambled insertion order)
    val df = (1 to 10000).map(i => ((i * 2654435761L) % 99991, i.toLong)).toDF("k", "v")
    val n = graft.sources.Tables.writeRangeLayout(df, dir, "k", 8)
    assert(n == 8, s"expected 8 range files, got $n")
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length == 8)
    // every file covers a disjoint key range (this is what lets parquet
    // row-group stats prune all out-of-range I/O to footer-only reads)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col("k")), max(col("k"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"file ranges overlap: max $aMax vs next min $bMin")
      case _ =>
    }
    // rows are sorted inside each file (row groups internally ordered)
    files.foreach { f =>
      val ks = spark.read.parquet(f).select(col("k")).as[Long].collect()
      assert(ks.sameElements(ks.sorted), s"file $f not sorted on k")
    }
    // nothing lost
    assert(spark.read.parquet(dir).count() == 10000)
  }

  test("writeZOrderLayout: per-file tiles bound BOTH dimensions; a y-only filter skips files") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString + "/t"
    // 64x64 grid, hash-scrambled arrival order
    val df = (0 until 4096).sortBy(i => (i * 2654435761L) % 99991)
      .map(i => (i % 64L, i / 64L)).toDF("x", "y")
    val n = graft.sources.Tables.writeZOrderLayout(df, dir, "x", "y", nFiles = 16)
    assert(n == 16, s"expected 16 z-files, got $n")
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.toString)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("x")), max(col("x")), min(col("y")), max(col("y"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // both dims are bounded per file (16 files over a 64x64 grid ~ 16x16
    // tiles; allow generous slop for range-boundary straddle). A single-key
    // range layout would leave the OTHER dim's span at the full 63.
    val avgX = ranges.map { case (lo, hi, _, _) => hi - lo }.sum.toDouble / ranges.length
    val avgY = ranges.map { case (_, _, lo, hi) => hi - lo }.sum.toDouble / ranges.length
    assert(avgX < 40 && avgY < 40, s"tiles too wide: avg x span $avgX, y span $avgY")
    // data skipping on the SECOND dim alone: a y-slice of height 8 (1/8 of
    // the domain) intersects a minority of file tiles
    val hit = ranges.count { case (_, _, lo, hi) => hi >= 8 && lo < 16 }
    assert(hit <= 8, s"y-slice [8,16) should skip most files, hit $hit of 16")
    assert(spark.read.parquet(dir).count() == 4096)
  }
}
