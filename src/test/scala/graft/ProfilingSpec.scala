package graft

import org.apache.spark.sql.functions.lit

import graft.ext.Profiling

class ProfilingSpec extends SparkTestBase {
  import spark.implicits._

  test("columnProfile: counts, nulls, distincts, lexicographic min/max") {
    val df = Seq(
      (Some(1), Some("b"), Some(10.0)),
      (Some(2), None, Some(2.5)),
      (Some(2), Some("a"), None),
      (None, Some("a"), Some(10.0))
    ).toDF("k", "s", "v")
    val got = Profiling.columnProfile(df, Seq("k", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(got("k") == ((4L, 1L, 2L, "1", "2")))
    assert(got("s") == ((4L, 1L, 2L, "a", "b")))
    // doubles cast to string: "10.0" < "2.5" lexicographically
    assert(got("v") == ((4L, 1L, 2L, "10.0", "2.5")))
  }

  test("columnProfile on an all-null column yields null min/max, zero distinct") {
    val df = Seq((1, Option.empty[String]), (2, None)).toDF("k", "s")
    val r = Profiling.columnProfile(df, Seq("s")).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("populationStability: identical snapshots score 0, shifted ones score high") {
    val a = Seq(("g", 1.0), ("g", 1.5), ("g", 12.0), ("g", 12.5)).toDF("grp", "v")
    // identical distribution -> every term ln(1)=0
    val same = Profiling.populationStability(a, a, "grp", "v", 10.0).collect().head
    assert(same.getLong(1) == 4L && same.getLong(2) == 4L)
    assert(same.getLong(3) == 2L && same.getLong(4) == 0L && same.getLong(5) == 0L)
    assert(same.getDouble(6) == 0.0)
    // B fully shifted into bin 1 plus a new bin 2: bin 0 becomes a-only
    val b = Seq(("g", 11.0), ("g", 13.0), ("g", 14.0), ("g", 25.0)).toDF("grp", "v")
    val r = Profiling.populationStability(a, b, "grp", "v", 10.0).collect().head
    assert(r.getLong(3) == 1L)  // bin 1 shared
    assert(r.getLong(4) == 1L)  // bin 0 a-only
    assert(r.getLong(5) == 1L)  // bin 2 b-only
    // shared bin: p=1/2, q=3/4 -> (p-q)ln(p/q) = (-0.25)·ln(2/3)
    val expected = math.rint(-0.25 * math.log(2.0 / 3.0) * 1e6) / 1e6
    assert(math.abs(r.getDouble(6) - expected) < 1e-9)
  }

  test("madOutliers flags only points beyond k·MAD and survives mad=0") {
    val df = (Seq.fill(5)(10.0) ++ Seq(10.5, 9.5, 50.0)).zipWithIndex
      .map { case (v, i) => ("g", v) }.toDF("grp", "v")
    // median 10, deviations (0x5, .5, .5, 40) -> mad 0: every nonzero dev flagged
    val r = Profiling.madOutliers(df, "grp", "v", 3.0).collect().head
    assert(r.getLong(1) == 8L && r.getDouble(2) == 10.0 && r.getDouble(3) == 0.0)
    assert(r.getLong(4) == 3L)
    // well-spread group: only the far point breaks the 3·MAD fence
    val df2 = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0).map(("h", _)).toDF("grp", "v")
    val r2 = Profiling.madOutliers(df2, "grp", "v", 3.0).collect().head
    assert(r2.getDouble(2) == 3.5 && r2.getLong(4) == 1L)
  }

  test("groupOls recovers a known line and nulls out degenerate groups") {
    // group a: y = 2x + 1 exactly (2-decimal values on the line)
    val df = Seq(
      ("a", 1.00, 3.00), ("a", 2.00, 5.00), ("a", 3.00, 7.00), ("a", 4.50, 10.00),
      ("b", 5.00, 1.00), ("b", 5.00, 9.00),    // zero x-variance
      ("c", 1.00, 4.00), ("c", 2.00, 4.00)     // zero y-variance: slope 0, r2 null
    ).toDF("g", "x", "y")
    val got = Profiling.groupOls(df, "g", "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 4L)
    assert(math.abs(a.getDouble(2) - 2.0) < 1e-12)       // slope
    assert(math.abs(a.getDouble(3) - 1.0) < 1e-12)       // intercept (unscaled)
    assert(math.abs(a.getDouble(4) - 1.0) < 1e-12)       // perfect fit
    val b = got("b")
    assert(b.isNullAt(2) && b.isNullAt(3) && b.isNullAt(4))
    val c = got("c")
    assert(c.getDouble(2) == 0.0 && c.isNullAt(4))
  }

  test("skewProfile: exact counts, ppm shares, ceil salt, deterministic top-k cut") {
    val df = (Seq.fill(6)("x") ++ Seq.fill(3)("y") ++ Seq("z")).toDF("k")
    val got = Profiling.skewProfile(df, "k", parts = 4, topK = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // total 10: x 6/10 -> 600000 ppm, salt ceil(6·4/10)=3; y: 300000, salt 2
    assert(got.toSeq == Seq(("x", 6L, 600000L, 3L), ("y", 3L, 300000L, 2L)))
    // count ties broken by key ascending, so the top-k cut is stable
    val tied = (Seq.fill(2)("b") ++ Seq.fill(2)("a") ++ Seq.fill(2)("c")).toDF("k")
    val t2 = Profiling.skewProfile(tied, "k", parts = 2, topK = 2).collect()
      .map(_.getString(0)).toSeq
    assert(t2 == Seq("a", "b"))
    // a uniform key needs no salt: every salt is 1
    val uni = (1 to 8).map(_.toString).toDF("k")
    assert(Profiling.skewProfile(uni, "k", 4, 8).collect()
      .forall(_.getLong(3) == 1L))
  }

  test("skewProfile: NULL keys fold into the '<null>' sentinel group") {
    // a NULL shuffle key is often THE hotspot — it must appear in the
    // profile, with engine-neutral ordering (Spark sorts NULL first ASC,
    // DuckDB last; the sentinel removes the divergence — ADVICE r9)
    val df = (Seq.fill(5)(Option.empty[String]) ++
      Seq.fill(3)(Some("en")) ++ Seq.fill(2)(Some("fr"))).toDF("k")
    val got = Profiling.skewProfile(df, "k", parts = 2, topK = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("<null>", 5L), ("en", 3L), ("fr", 2L)))
  }

  test("histCells/histRollupPercentiles: binWidth=1 recovers exact discrete percentiles") {
    // key "a": values 1..100 across two subs -> p50=50, p90=90, p99=99
    val df = ((1 to 60).map(v => ("a", "x", v.toLong)) ++
      (61 to 100).map(v => ("a", "y", v.toLong)) ++
      Seq(("b", "x", 7L), ("b", "y", 7L), ("b", "y", 9L))).toDF("k", "s", "v")
    val cells = Profiling.histCells(df, "k", "s", "v", binWidth = 1L, nBins = 512)
    val got = Profiling.histRollupPercentiles(cells, "k", 1L, Seq(50, 90, 99))
      .as[(String, Long, Long, Long)].collect()
      .map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
    assert(got("a") === ((50L, 90L, 99L)))
    // b: n=3, p50 -> ceil(1.5)=2nd value = 7, p90/p99 -> 3rd = 9
    assert(got("b") === ((7L, 9L, 9L)))
  }

  test("histRollupPercentiles: coarse bins report the containing bin's lower edge; overflow clamps") {
    val df = (Seq.fill(9)(("a", "x", 5L)) :+ ("a", "x", 99999L)).toDF("k", "s", "v")
    val cells = Profiling.histCells(df, "k", "s", "v", binWidth = 10L, nBins = 16)
    // value 5 -> bin 0 (edge 0); 99999 -> clamped to bin 15 (edge 150)
    val got = Profiling.histRollupPercentiles(cells, "k", 10L, Seq(50, 99))
      .as[(String, Long, Long)].collect().head
    assert(got === (("a", 0L, 150L)))
    // cell table is bounded: at most nBins rows per (k, s)
    assert(cells.count() === 2)
  }

  test("histCells: rollup over persisted cells equals the direct single-grain computation; nulls/negatives carry no mass") {
    val df = (Seq(("a", "x", Some(12L)), ("a", "y", Some(30L)),
      ("a", "y", None), ("a", "x", Some(-4L)), ("a", "z", Some(30L)))).toDF("k", "s", "v")
    val viaCells = Profiling.histRollupPercentiles(
      Profiling.histCells(df, "k", "s", "v", 8L, 32), "k", 8L, Seq(50))
      .as[(String, Long)].collect().toMap
    val direct = Profiling.histRollupPercentiles(
      Profiling.histCells(df.withColumn("s", lit("all")), "k", "s", "v", 8L, 32),
      "k", 8L, Seq(50))
      .as[(String, Long)].collect().toMap
    // 3 valid values 12,30,30 -> p50 = 2nd = 30 -> bin 3 edge 24
    assert(viaCells === Map("a" -> 24L) && direct === viaCells)
  }
}
