package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

class JoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def facts = Seq(
    (1L, "Acme Sales Team"),
    (2L, "marketing group"),
    (3L, "unknown dept"),
    (4L, "Acme Sales Team") // duplicate payload, distinct row
  ).toDF("fid", "name")

  private def dims = Seq(
    (10, "sales", 1),
    (20, "marketing", 2),
    (30, "acme", 3) // also contained in rows 1/4 — ordinal decides
  ).toDF("id", "nombre", "ord")

  test("containsLookup picks the FIRST matching dim row by ordinal") {
    val out = Joins.containsLookup(facts, dims, "name", "nombre", "ord", "id", "dept_id")
      .select("fid", "dept_id").as[(Long, Option[Int])].collect().toMap
    assert(out(1L).contains(10)) // sales (ord 1) beats acme (ord 3)
    assert(out(2L).contains(20))
    assert(out(3L).isEmpty)      // no dim contained -> null
    assert(out(4L).contains(10))
  }

  test("containsLookupIndexed matches the relational containsLookup exactly") {
    val relational = Joins.containsLookup(facts, dims, "name", "nombre", "ord", "id", "dept_id")
      .select("fid", "dept_id").as[(Long, Option[Int])].collect().toMap
    val indexed = Joins.containsLookupIndexed(facts, dims, "name", "nombre", "ord", "id", "dept_id")
      .select("fid", "dept_id").as[(Long, Option[Int])].collect().toMap
    assert(indexed == relational)
    assert(indexed(1L).contains(10) && indexed(3L).isEmpty)
  }

  test("containsLookupIndexed fails fast when the dim exceeds the vocabulary bound") {
    val bigDim = spark.range(Joins.MaxIndexedDimRows + 1)
      .select(concat(lit("needle"), col("id")).as("nombre"),
        col("id").as("ord"), col("id").cast("int").as("id"))
    val e = intercept[IllegalArgumentException] {
      Joins.containsLookupIndexed(facts, bigDim, "name", "nombre", "ord", "id", "dept_id")
    }
    assert(e.getMessage.contains("containsLookup"),
      s"guard message should point at the BNLJ fallback: ${e.getMessage}")
  }

  test("containsLookup preserves duplicate fact rows") {
    val out = Joins.containsLookup(facts, dims, "name", "nombre", "ord", "id", "dept_id")
    assert(out.count() == 4)
  }

  test("antiByKey keeps only rows with absent keys") {
    val incoming = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val existing = Seq((2, "x")).toDF("k", "v")
    val got = Joins.antiByKey(incoming, existing, Seq("k")).as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (3, "c")))
  }

  test("semiByKey keeps only rows with present keys") {
    val fact = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val other = Seq((2, "ignored")).toDF("k", "w")
    assert(Joins.semiByKey(fact, other, Seq("k")).as[(Int, String)].collect().toSeq == Seq((2, "b")))
  }

  test("asofJoin attaches the latest right row at or before the left ts") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val trades = Seq(
      (1, ts("2024-01-01 10:00:00"), "t1"),
      (1, ts("2024-01-01 12:00:00"), "t2"),
      (2, ts("2024-01-01 08:00:00"), "t3") // before any quote
    ).toDF("k", "ts", "trade")
    val quotes = Seq(
      (1, ts("2024-01-01 09:00:00"), 5.0),
      (1, ts("2024-01-01 10:00:00"), 6.0), // equal ts => inclusive match
      (1, ts("2024-01-01 11:00:00"), 7.0),
      (2, ts("2024-01-01 09:00:00"), 9.0)
    ).toDF("k", "ts", "price")
    val got = Joins.asofJoin(trades, quotes, Seq("k"), "ts", "ts", Seq("price"))
      .select("trade", "price").as[(String, Option[Double])].collect().toMap
    assert(got("t1").contains(6.0)) // equal-ts quote wins over 09:00
    assert(got("t2").contains(7.0))
    assert(got("t3").isEmpty)      // no quote at or before 08:00
  }

  test("rangeJoinBinned matches points to covering intervals, no equi key") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val points = Seq((1, ts("2024-01-01 10:30:00")), (2, ts("2024-01-03 00:00:00"))).toDF("pid", "ts")
    val intervals = Seq(
      ("w1", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      ("w2", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
      ("w3", ts("2024-01-02 23:00:00"), ts("2024-01-03 00:00:00")) // end-exclusive
    ).toDF("w", "start", "end")
    val got = Joins.rangeJoinBinned(points, "ts", intervals, "start", "end", 3600)
      .select("pid", "w").as[(Int, String)].collect().toSet
    assert(got == Set((1, "w1"), (1, "w2"))) // point 2 excluded: end is exclusive
  }

  test("bloomSemiJoin equals a plain left-semi join (no false positives survive)") {
    val fact = spark.range(0, 2000).select(col("id").as("fk"), (col("id") % 7).as("payload"))
    val build = spark.range(0, 2000, 13).select(col("id").as("bk")) // every 13th key
    val got = Joins.bloomSemiJoin(fact, "fk", build, "bk", expectedKeys = 200)
      .select("fk").as[Long].collect().toSet
    val want = fact.join(build, col("fk") === col("bk"), "left_semi")
      .select("fk").as[Long].collect().toSet
    assert(got == want)
    assert(want.nonEmpty && got.forall(_ % 13 == 0))
  }

  test("bloomSemiJoin rejects an unbroadcastable expectedKeys") {
    val df = spark.range(1).select(col("id").as("k"))
    val e = intercept[IllegalArgumentException] {
      Joins.bloomSemiJoin(df, "k", df, "k", expectedKeys = 200000000L)
    }
    assert(e.getMessage.contains("expectedKeys"))
  }

  test("enrich left join keeps unmatched fact rows with nulls") {
    val fact = Seq((1, 10), (2, 99)).toDF("k", "dimk")
    val dim = Seq((10, "ten")).toDF("dk", "label")
    val got = Joins.enrich(fact, dim, col("dimk") === col("dk"), "left")
      .select("k", "label").as[(Int, Option[String])].collect().toSet
    assert(got == Set((1, Some("ten")), (2, None)))
  }
}
