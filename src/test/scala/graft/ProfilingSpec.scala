package graft

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
}
