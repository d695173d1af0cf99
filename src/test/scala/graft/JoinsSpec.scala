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

  test("enrich left join keeps unmatched fact rows with nulls") {
    val fact = Seq((1, 10), (2, 99)).toDF("k", "dimk")
    val dim = Seq((10, "ten")).toDF("dk", "label")
    val got = Joins.enrich(fact, dim, col("dimk") === col("dk"), "left")
      .select("k", "label").as[(Int, Option[String])].collect().toSet
    assert(got == Set((1, Some("ten")), (2, None)))
  }
}
