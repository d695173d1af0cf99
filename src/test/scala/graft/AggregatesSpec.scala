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
}
