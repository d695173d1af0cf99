package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ext.Sketches

/** Mergeable HLL rollup: exactness in coupon mode, the parquet
  * round-trip that makes "materialized sketch" real, rescan-free coarser
  * rollups, and the error band at dense-mode cardinalities.
  */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  // 3 keys × 3 subs, values overlapping across subs within a key — the
  // union must dedupe across cells, not sum them.
  private def smallDf = {
    val rows = for {
      k <- Seq("a", "b", "c"); s <- 0 until 3; v <- 0 until 40
    } yield (k, s, s"$k-${(v + s * 20) % 60}") // 20-value overlap between adjacent subs
    rows.toDF("key", "sub", "value")
  }

  test("coupon-mode rollup is exact and both estimate paths agree with exact") {
    val got = Sketches.hllRollup(smallDf, "key", "sub", "value")
      .select("key", "n_cells", "est_merged", "est_direct")
      .as[(String, Long, Long, Long)].collect().toSet
    // per key: subs cover {k-0..k-59} with overlaps -> 60 distinct values
    assert(got === Set(("a", 3L, 60L, 60L), ("b", 3L, 60L, 60L), ("c", 3L, 60L, 60L)))
  }

  test("cell sketches round-trip through parquet and merge to the same estimates") {
    val dir = Files.createTempDirectory("graft_sketch").toString
    Sketches.cellSketches(smallDf, "key", "sub", "value")
      .write.mode("overwrite").parquet(dir)
    val reread = Sketches.mergeCells(spark.read.parquet(dir), "key")
      .select("key", "n_cells", "est_merged")
      .as[(String, Long, Long)].collect().toSet
    val direct = Sketches.mergeCells(
        Sketches.cellSketches(smallDf, "key", "sub", "value"), "key")
      .select("key", "n_cells", "est_merged")
      .as[(String, Long, Long)].collect().toSet
    assert(reread === direct)
    assert(reread.map(_._3) === Set(60L))
  }

  test("persisted cell sketches answer a coarser rollup without the raw data") {
    // rollup to a SINGLE global key from cells only: 3 keys x 60 distinct
    // values each, value domains disjoint across keys (prefixed) -> 180
    val cells = Sketches.cellSketches(smallDf, "key", "sub", "value")
      .withColumn("all", lit("corpus"))
    val global = Sketches.mergeCells(cells, "all")
      .select("n_cells", "est_merged").as[(Long, Long)].collect().toSeq
    assert(global === Seq((9L, 180L)))
  }

  test("dense-mode estimates stay within the documented band of exact") {
    val big = (1 to 200000)
      .map(i => (s"k${i % 2}", i % 5, s"v$i")).toDF("key", "sub", "value")
    val ok = Sketches.hllRollupCheck(big, "key", "sub", "value")
      .select("merged_within_tol", "direct_within_tol")
      .as[(Boolean, Boolean)].collect()
    assert(ok.length === 2 && ok.forall(t => t._1 && t._2))
  }

  test("hllIntersect: coupon-mode inclusion-exclusion recovers exact overlaps") {
    // A = {0..59}, B = {40..99} (|A∩B| = 20), C = {200..219} (disjoint)
    val df = ((0 until 60).map(v => ("A", v)) ++
      (40 until 100).map(v => ("B", v)) ++
      (200 until 220).map(v => ("C", v))).toDF("seg", "v")
    val got = Sketches.hllIntersect(df, "seg", "v")
      .select("set_a", "set_b", "est_a", "est_b", "est_union", "est_intersect")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("A", "B", 60L, 60L, 100L, 20L),
      ("A", "C", 60L, 20L, 80L, 0L),
      ("B", "C", 60L, 20L, 80L, 0L)))
    val check = Sketches.hllIntersectCheck(df, "seg", "v")
      .select("within_tol").as[Boolean].collect()
    assert(check.length === 3 && check.forall(identity))
  }

  test("hllIntersect: dense-mode estimates stay inside the union-relative band") {
    // two 100k-value sets with a 30k overlap — well past coupon mode
    val df = ((1 to 100000).map(v => ("X", v)) ++
      (70001 to 170000).map(v => ("Y", v))).toDF("seg", "v")
    val ok = Sketches.hllIntersectCheck(df, "seg", "v")
      .select("within_tol").as[Boolean].collect()
    assert(ok.length === 1 && ok.head)
  }

  test("null values are ignored, empty cells still appear via other subs") {
    val df = Seq(("a", 0, "x"), ("a", 0, null), ("a", 1, "y"))
      .toDF("key", "sub", "value")
    val got = Sketches.hllRollup(df, "key", "sub", "value")
      .select("key", "n_cells", "est_merged", "est_direct")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("a", 2L, 2L, 2L)))
  }
}
