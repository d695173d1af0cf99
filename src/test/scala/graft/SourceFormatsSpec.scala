package graft

import graft.sources.Tables

/** Round-trips for the non-parquet staging formats: what lands in the
  * staging dir (CSV via HttpFetch, NDJSON feeds, ORC lakes) must read back
  * through the same Tables facade the parquet catalog uses.
  */
class SourceFormatsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("json: NDJSON round-trip, inferred and explicit schema") {
    val dir = tmp("graft_json")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "score")
    df.write.mode("overwrite").json(s"$dir/t")
    val inferred = Tables.json(spark, Seq(s"$dir/t"))
      .select("id", "name", "score").as[(Long, String, Double)].collect().toSet
    assert(inferred == Set((1L, "a", 1.5), (2L, "b", 2.5)))
    val explicit = Tables.json(spark, Seq(s"$dir/t"),
      Some("id BIGINT, name STRING, score DOUBLE"))
    assert(explicit.schema.map(_.name) == Seq("id", "name", "score"))
    assert(explicit.count() == 2)
  }

  test("orc: round-trip preserves schema and values") {
    val dir = tmp("graft_orc")
    val df = Seq((1, "x"), (2, "y")).toDF("k", "v")
    df.write.mode("overwrite").orc(s"$dir/t")
    val back = Tables.orc(spark, s"$dir/t")
    // names+types survive; nullability widens on write (normal Spark file-sink behavior)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.as[(Int, String)].collect().toSet == Set((1, "x"), (2, "y")))
  }
}
