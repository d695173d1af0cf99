package graft

import java.nio.file.Files
import graft.operators.Upsert

class UpsertSpec extends SparkTestBase {
  import spark.implicits._

  test("mergeInsertOnly inserts only absent keys") {
    val existing = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val incoming = Seq((2, "NEW"), (3, "c")).toDF("k", "v")
    val got = Upsert.mergeInsertOnly(existing, incoming, Seq("k"))
      .as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (2, "b"), (3, "c"))) // (2,NEW) is NOT applied
  }

  test("upsertParquet creates, appends only new keys, and is idempotent") {
    val dir = Files.createTempDirectory("graft_upsert").toString + "/t"
    val b1 = Seq((1, "a"), (2, "b")).toDF("k", "v")
    assert(Upsert.upsertParquet(spark, b1, dir, Seq("k")) == 2)
    // re-running the same batch inserts nothing (idempotence)
    assert(Upsert.upsertParquet(spark, b1, dir, Seq("k")) == 0)
    val b2 = Seq((2, "x"), (3, "c")).toDF("k", "v")
    assert(Upsert.upsertParquet(spark, b2, dir, Seq("k")) == 1)
    val stored = spark.read.parquet(dir).as[(Int, String)].collect().toSet
    assert(stored == Set((1, "a"), (2, "b"), (3, "c")))
  }

  test("mergeUpsert: incoming replaces matched keys, keeps the rest") {
    val existing = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val incoming = Seq((2, "NEW"), (3, "c")).toDF("k", "v")
    val got = Upsert.mergeUpsert(existing, incoming, Seq("k"))
      .as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (2, "NEW"), (3, "c")))
  }

  test("scd2Apply closes changed rows, opens new versions, passes unchanged") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val current = Seq(
      (1, "dept_x", ts("2023-01-01 00:00:00"), null.asInstanceOf[Timestamp]), // will change
      (2, "dept_y", ts("2023-01-01 00:00:00"), null.asInstanceOf[Timestamp]), // unchanged
      (1, "dept_old", ts("2022-01-01 00:00:00"), ts("2023-01-01 00:00:00"))   // history row
    ).toDF("emp_id", "dept", "valid_from", "valid_to")
    val updates = Seq(
      (1, "dept_z", ts("2024-06-01 00:00:00")),
      (2, "dept_y", ts("2024-06-01 00:00:00")), // same value: no-op
      (9, "dept_new", ts("2024-06-01 00:00:00")) // brand-new key
    ).toDF("emp_id", "dept", "updated_at")
    val out = Upsert.scd2Apply(current, updates, "emp_id", Seq("dept"), "updated_at")
      .as[(Int, String, Timestamp, Option[Timestamp])].collect().toSet
    assert(out == Set(
      (1, "dept_old", ts("2022-01-01 00:00:00"), Some(ts("2023-01-01 00:00:00"))),
      (1, "dept_x", ts("2023-01-01 00:00:00"), Some(ts("2024-06-01 00:00:00"))), // closed
      (1, "dept_z", ts("2024-06-01 00:00:00"), None),                            // new open
      (2, "dept_y", ts("2023-01-01 00:00:00"), None),                            // untouched
      (9, "dept_new", ts("2024-06-01 00:00:00"), None)))                         // first row
  }

  test("property: upsert twice == upsert once (row sets), random batches") {
    val rnd = new scala.util.Random(42)
    def batch() = List.fill(8)((rnd.nextInt(6), rnd.nextPrintableChar().toString))
    (1 to 10).foreach { _ =>
      val existing = batch().toDF("k", "v").dropDuplicates("k")
      val incoming = batch().toDF("k", "v").dropDuplicates("k")
      val once = Upsert.mergeInsertOnly(existing, incoming, Seq("k"))
      val twice = Upsert.mergeInsertOnly(once, incoming, Seq("k"))
      assert(rows(twice) == rows(once))
    }
  }
}
