package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAgg

class TopKAggSpec extends SparkTestBase {
  import spark.implicits._

  test("TopKAgg matches a row_number window on random data with heavy ties") {
    val rnd = new scala.util.Random(3)
    val rows = (1L to 500L).map(id => (id % 7, id, rnd.nextInt(5).toDouble))
    val df = rows.toDF("g", "id", "score")
    val topk = TopKAgg.topK(4)
    val got = df.groupBy("g")
      .agg(topk(col("id"), col("score")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("col._2").as("id"), col("col._1").as("score"))
      .as[(Long, Int, Long, Double)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val want = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 4)
      .select(col("g"), col("rank"), col("id"), col("score"))
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("TopKAgg: groups smaller than k return all rows, best first") {
    val df = Seq((1L, 10L, 1.0), (1L, 11L, 3.0)).toDF("g", "id", "score")
    val topk = TopKAgg.topK(5)
    val got = df.groupBy("g").agg(topk(col("id"), col("score")).as("top"))
      .select(explode(col("top"))).select(col("col._2")).as[Long].collect().toSeq
    assert(got == Seq(11L, 10L))
  }

  test("TopKAgg ranks NaN scores first, like a value-DESC window in Spark/DuckDB") {
    val df = Seq((1L, 10L, 1.0), (1L, 11L, Double.NaN), (1L, 12L, 2.0), (1L, 13L, Double.NaN))
      .toDF("g", "id", "score")
    val topk = TopKAgg.topK(3)
    val got = df.groupBy("g").agg(topk(col("id"), col("score")).as("top"))
      .select(explode(col("top"))).select(col("col._2")).as[Long].collect().toSeq
    // NaN sorts as the largest score; NaN ties break by id
    assert(got == Seq(11L, 13L, 12L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .orderBy("rn").select("id").as[Long].collect().toSeq
    assert(got == want)
  }

  test("TopKAgg reduce/merge directly: bounded buffer, deterministic ties") {
    val a = TopKAgg(2)
    val buf = Seq((5L, 1.0), (6L, 2.0), (7L, 2.0), (8L, 0.5))
      .foldLeft(a.zero)((b, in) => a.reduce(b, in))
    assert(buf == Vector((2.0, 6L), (2.0, 7L))) // ties -> smaller id first
    val merged = a.merge(buf, Vector((3.0, 9L)))
    assert(merged == Vector((3.0, 9L), (2.0, 6L)))
  }
}
