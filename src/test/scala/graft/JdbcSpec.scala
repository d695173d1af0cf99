package graft

import java.nio.file.Files

import graft.sources.Jdbc

/** Round-trip spec for the JDBC source/sink against embedded Apache Derby —
  * a real JDBC database in-process, exercising the same code paths a
  * networked database would (dialect, metadata probe, batched inserts,
  * partitioned reads).
  */
class JdbcSpec extends SparkTestBase {
  import spark.implicits._

  // quiet Derby's log file; one database per suite run
  System.setProperty("derby.stream.error.file", "/tmp/derby.log")
  private val dbDir = Files.createTempDirectory("graft_derby").toString + "/db"
  private val url = s"jdbc:derby:$dbDir;create=true"

  test("write + readTable round-trips a dimension") {
    val dim = Seq((1, "EUROPE"), (2, "ASIA"), (3, "AFRICA")).toDF("r_key", "r_name")
    dim.write.mode("overwrite").jdbc(url, "region_rt", Jdbc.props())
    val back = Jdbc.readTable(spark, url, "region_rt")
      .as[(Int, String)].collect().toSet
    assert(back == Set((1, "EUROPE"), (2, "ASIA"), (3, "AFRICA")))
  }

  test("tableExists: false before, true after") {
    assert(!Jdbc.tableExists(url, "ghosts"))
    Seq((1, "x")).toDF("k", "v").write.jdbc(url, "ghosts", Jdbc.props())
    assert(Jdbc.tableExists(url, "ghosts"))
  }

  test("upsertJdbc: creates, appends only new keys, idempotent re-run") {
    val b1 = Seq((1, "a"), (2, "b")).toDF("k", "v")
    assert(Jdbc.upsertJdbc(b1, url, "facts", Seq("k")) == 2)
    assert(Jdbc.upsertJdbc(b1, url, "facts", Seq("k")) == 0) // replayed window
    val b2 = Seq((2, "CHANGED"), (3, "c")).toDF("k", "v")
    assert(Jdbc.upsertJdbc(b2, url, "facts", Seq("k")) == 1) // only key 3
    val stored = Jdbc.readTable(spark, url, "facts").as[(Int, String)].collect().toSet
    assert(stored == Set((1, "a"), (2, "b"), (3, "c"))) // (2,CHANGED) not applied
  }

  test("upsertJdbc: composite business key") {
    val b1 = Seq((1, "d1", 10.0), (1, "d2", 20.0)).toDF("id", "day", "value")
    assert(Jdbc.upsertJdbc(b1, url, "facts2", Seq("id", "day")) == 2)
    val b2 = Seq((1, "d2", 99.0), (2, "d1", 30.0)).toDF("id", "day", "value")
    assert(Jdbc.upsertJdbc(b2, url, "facts2", Seq("id", "day")) == 1)
    assert(Jdbc.readTable(spark, url, "facts2").count() == 3)
  }

  test("readPartitioned splits the scan without changing the result") {
    val fact = (1 to 100).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
    fact.write.mode("overwrite").jdbc(url, "bigfact", Jdbc.props())
    val scanned = Jdbc.readPartitioned(spark, url, "bigfact", "id", 1L, 100L, 4)
    assert(scanned.rdd.getNumPartitions == 4)
    assert(scanned.count() == 100)
    assert(scanned.as[(Long, String)].collect().toSet ==
      (1 to 100).map(i => (i.toLong, s"row$i")).toSet)
  }

  test("readQuery pushes SQL text to the database") {
    // raw SQL hits the database's identifier-fold rule directly: Spark
    // created the columns quoted-lowercase, so the query must quote them
    val got = Jdbc.readQuery(spark, url,
      """SELECT "r_name" FROM region_rt WHERE "r_key" <= 2""")
      .as[String].collect().toSet
    assert(got == Set("EUROPE", "ASIA"))
  }

  test("streaming jdbcUpsertSink: replayed keys never duplicate in the database") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Int, String)]
    val ckpt = Files.createTempDirectory("graft_jdbc_ckpt").toString
    val q = graft.streaming.Streams.jdbcUpsertSink(
      input.toDF().toDF("k", "v"), url, "stream_facts", Seq("k"), ckpt)
    try {
      input.addData((1, "a"), (2, "b"))
      q.processAllAvailable()
      input.addData((2, "REPLAY"), (3, "c")) // key 2 replayed with new payload
      q.processAllAvailable()
      val stored = Jdbc.readTable(spark, url, "stream_facts")
        .as[(Int, String)].collect().toSet
      assert(stored == Set((1, "a"), (2, "b"), (3, "c"))) // no dup, no overwrite
    } finally q.stop()
  }

  test("filter + projection are pushed into the JDBC scan") {
    val plan = Jdbc.readTable(spark, url, "bigfact")
      .filter($"id" > 90).select("payload")
      .queryExecution.executedPlan.toString
    // JDBCRelation advertises pushed filters/columns in the scan node
    assert(plan.contains("PushedFilters") && plan.contains("IsNotNull"))
  }
}
