package graft

import org.apache.spark.sql.functions._

class DayRangeSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def read(from: String, to: String, parts: Int = 4) =
    spark.read.format("graft.sources.v2.DayRangeSource")
      .option("from", from).option("to", to)
      .option("numPartitions", parts.toString).load()

  test("emits one row per day, inclusive bounds (pd.date_range semantics)") {
    val df = read("2024-02-27", "2024-03-02")
    assert(df.count() == 5) // leap year
    val days = df.orderBy("day").select(date_format(col("day"), "yyyy-MM-dd"))
      .as[String].collect().toSeq
    assert(days == Seq("2024-02-27", "2024-02-28", "2024-02-29", "2024-03-01", "2024-03-02"))
  }

  test("plans parallel input partitions over the day range") {
    val df = read("2024-01-01", "2024-01-31", parts = 8)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 31)
    // ordinals are a global 0..n-1 sequence across partitions
    val ords = df.select("day_ordinal").as[Int].collect().sorted.toSeq
    assert(ords == (0 until 31))
  }

  test("range filters push into partition planning (source-level pruning)") {
    val df = read("2024-01-01", "2024-12-31", parts = 12)
      .filter(col("day") >= lit("2024-06-01").cast("date") &&
              col("day") < lit("2024-06-08").cast("date"))
    assert(df.count() == 7)
    // pruned range plans far fewer partitions than the full year would
    assert(df.rdd.getNumPartitions <= 12)
    val pruned = read("2024-01-01", "2024-12-31", parts = 12)
      .filter(col("day") === lit("2024-06-05").cast("date"))
    assert(pruned.count() == 1)
    assert(pruned.rdd.getNumPartitions == 1)
  }

  test("contradictory pushed filters yield an empty result, not an error") {
    val df = read("2024-01-01", "2024-01-31")
      .filter(col("day") > lit("2024-03-01").cast("date"))
    assert(df.count() == 0)
  }

  test("single day and joins against fact tables work") {
    val df = read("2024-01-05", "2024-01-05", parts = 4)
    assert(df.count() == 1)
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", to_date(col("ts")))
    val joined = events.join(broadcast(read("2024-01-01", "2024-01-07")), Seq("day"))
    assert(joined.count() > 0)
  }
}
