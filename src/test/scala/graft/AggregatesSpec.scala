package graft

import org.apache.spark.sql.functions._
import graft.operators.Aggregates

class AggregatesSpec extends SparkTestBase {
  import spark.implicits._

  test("firstBy/lastBy select by explicit ordinal, not row order") {
    val df = Seq(("g", "late", 3), ("g", "early", 1), ("g", "mid", 2)).toDF("g", "v", "ord")
      .repartition(4) // scramble physical order
    val got = df.groupBy("g").agg(
      Aggregates.firstBy(col("v"), col("ord")).as("f"),
      Aggregates.lastBy(col("v"), col("ord")).as("l"))
      .as[(String, String, String)].head()
    assert(got == ("g", "early", "late"))
  }

  test("dedupeLastByKey keeps the row with the max ordinal per key") {
    val df = Seq((1, 100L, "old"), (1, 200L, "new"), (2, 5L, "only")).toDF("k", "ord", "v")
    val got = Aggregates.dedupeLastByKey(df, "k", "ord")
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(got == Set((1, "new"), (2, "only")))
  }

  test("argmaxRowPerGroup returns the full max row with deterministic ties") {
    val df = Seq(
      (1, 10L, "a"), (1, 10L, "b"), // tie on ord -> tiebreak col ascending wins
      (2, 7L, "z"), (2, 9L, "y")
    ).toDF("k", "ord", "tb")
    val got = Aggregates.argmaxRowPerGroup(df, Seq("k"), "ord", "tb")
      .select("k", "tb").as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (2, "y")))
  }

  test("exactPercentilesByKey == Spark percentile UDAF on random data (property)") {
    import org.apache.spark.sql.functions.expr
    val rnd = new scala.util.Random(42)
    // random group sizes incl. the edge cases: 1 row, 2 rows, heavy ties
    val rows = (0 until 5).flatMap { k =>
      val n = Seq(1, 2, 3, 17, 400)(k)
      (0 until n).map(_ => (s"g$k", rnd.nextInt(12)))
    }
    val df = rows.toDF("k", "v")
    val ps = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75")
    val got = Aggregates.exactPercentilesByKey(df, "k", "v", ps)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val want = df.groupBy("k").agg(
      expr("percentile(v, 0.25)").as("p25"),
      expr("percentile(v, 0.5)").as("p50"),
      expr("percentile(v, 0.75)").as("p75"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == want.keySet)
    for (k <- got.keySet) assert(got(k) == want(k), s"group $k: ${got(k)} vs ${want(k)}")
  }

  test("exactPercentilesByKey ignores nulls, matching the percentile UDAF") {
    import org.apache.spark.sql.functions.expr
    val df = Seq(("a", Some(10)), ("a", None), ("a", Some(20)), ("b", None))
      .toDF("k", "v")
    val got = Aggregates.exactPercentilesByKey(df, "k", "v", Seq(0.5 -> "p50"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    // percentile() over [10, 20] (null dropped) -> 15.0; all-null group b
    // still gets a row, with a NULL percentile — exactly like the UDAF
    assert(got == Map("a" -> Some(15.0), "b" -> None))
    val want = df.groupBy("k").agg(expr("percentile(v, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got == want)
  }

  test("exactPercentilesByKey keeps computed percentiles for a NULL group key") {
    import org.apache.spark.sql.functions.expr
    // NULL is an ordinary group to percentile()/quantile_cont: a NULL-key
    // group with non-null values must keep its computed percentiles (the
    // restore join is null-safe), and an all-null NULL-key group still rows
    val df = Seq((Option("a"), Some(10)), (None, Some(4)), (None, Some(8)),
      (Option("a"), Some(20)), (Option("b"), Option.empty[Int]))
      .toDF("k", "v")
    val got = Aggregates.exactPercentilesByKey(df, "k", "v", Seq(0.5 -> "p50"))
      .collect().map(r => Option(r.getString(0)) -> Option(r.get(1))).toMap
    val want = df.groupBy("k").agg(expr("percentile(v, 0.5)").as("p50"))
      .collect().map(r => Option(r.getString(0)) -> Option(r.get(1))).toMap
    assert(got == Map(Some("a") -> Some(15.0), None -> Some(6.0), Some("b") -> None))
    assert(got == want)
  }

  test("scaled-long moment sums == decimal-domain reference on random 2-dec data (property)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val rnd = new scala.util.Random(7)
    // 2-decimal doubles as produced by money/quantity columns
    val rows = (0 until 2000).map { i =>
      (s"g${i % 3}",
        math.rint(rnd.nextDouble() * 5000) / 100.0,
        math.rint(rnd.nextDouble() * 1.0e7) / 100.0)
    }
    val df = rows.toDF("k", "x", "y")
    // the q59 shape: scaled-long products summed as DECIMAL(38,0)
    val x100 = round(col("x") * lit(100)).cast("long")
    val y100 = round(col("y") * lit(100)).cast("long")
    val got = df.select(col("k"), x100.as("x100"), y100.as("y100"))
      .groupBy("k")
      .agg(sum((col("x100") * col("y100")).cast(DecimalType(38, 0))).as("sxy"))
      .select(col("k"), (col("sxy").cast(DecimalType(38, 4)) / lit(10000)).cast("double").as("sxy"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // reference: exact decimal-domain product sum
    val want = df.groupBy("k")
      .agg(sum(col("x").cast(DecimalType(18, 2)) * col("y").cast(DecimalType(18, 2))).as("sxy"))
      .select(col("k"), col("sxy").cast("double").as("sxy"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (k <- got.keySet) assert(got(k) == want(k), s"group $k: ${got(k)} vs ${want(k)}")
  }
}
