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
