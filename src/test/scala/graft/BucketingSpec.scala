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
}
