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
}
