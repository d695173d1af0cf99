package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.ext.Dedup

/** Edge cases for the native expressions: empty inputs, degenerate shapes,
  * non-ASCII text — the places a hand-written byte loop goes wrong.
  */
class ExpressionEdgeSpec extends SparkTestBase {
  import spark.implicits._

  test("wordShingleHashes: empty, blank, multi-space and n>len inputs") {
    val df = Seq("", "   ", "a  b", "one").toDF("t")
    val n1 = df.select(GraftFunctions.wordShingleHashes(col("t"), 1)).as[Seq[Long]].collect()
    assert(n1(0).isEmpty && n1(1).isEmpty)
    assert(n1(2).length == 2) // "a  b" -> two tokens despite double space
    val n3 = df.select(GraftFunctions.wordShingleHashes(col("t"), 3)).as[Seq[Long]].collect()
    assert(n3.forall(_.isEmpty)) // all docs shorter than 3 tokens
  }

  test("wordShingleHashes: case-insensitive and duplicate-collapsing") {
    val df = Seq("The THE the", "the").toDF("t")
    val got = df.select(GraftFunctions.wordShingleHashes(col("t"), 1)).as[Seq[Long]].collect()
    assert(got(0) == got(1)) // one distinct lowercased token either way
  }

  test("wordShingleHashes: non-ASCII text hashes without error") {
    val df = Seq("café niño café", "café niño").toDF("t")
    val got = df.select(GraftFunctions.wordShingleHashes(col("t"), 1)).as[Seq[Long]].collect()
    assert(got(0).length == 2 && got(0) == got(1))
  }

  test("minhash of an empty set is all Long.MaxValue (never joins a real doc)") {
    val df = Seq(Seq.empty[Long], Seq(1L, 2L)).toDF("s")
    val got = df.select(GraftFunctions.minhash(col("s"), 8)).as[Seq[Long]].collect()
    assert(got(0).forall(_ == Long.MaxValue))
    assert(got(1).forall(_ != Long.MaxValue))
  }

  test("sortedIntersectSize: empty and disjoint arrays") {
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L), Seq(2L, 4L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))).toDF("a", "b")
    val got = df.select(GraftFunctions.sortedIntersectSize(col("a"), col("b"))).as[Int].collect().toSeq
    assert(got == Seq(0, 0, 3))
  }

  test("firstEqualIndex: first match, no match, unequal lengths") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(9L, 2L, 3L)), // first agreement at index 1
      (Seq(1L, 2L), Seq(3L, 4L)),         // no agreement -> -1
      (Seq(7L, 8L, 9L), Seq(7L)),         // zipped to the shorter side
      (Seq.empty[Long], Seq(1L))          // empty -> -1
    ).toDF("a", "b")
    val got = df.select(GraftFunctions.firstEqualIndex(col("a"), col("b"))).as[Int].collect().toSeq
    assert(got == Seq(1, -1, 0, -1))
  }

  test("lshSignBuckets: empty vector gets bucket 0 in every table; buckets stay in range") {
    val df = Seq(Seq.empty[Float], Seq(1.0f, -2.0f, 0.5f)).toDF("v")
    val got = df.select(GraftFunctions.lshSignBuckets(col("v"), 6, 4)).as[Seq[Long]].collect()
    assert(got(0) == Seq(0L, 0L, 0L, 0L)) // the Column formulation's null-fold behavior
    assert(got(1).length == 4 && got(1).forall(b => b >= 0 && b < 64))
  }

  test("firstContainsIndex: no needles, empty haystack, overlap priority") {
    val df = Seq("abc def", "").toDF("t")
    val none = df.select(GraftFunctions.firstContainsIndex(col("t"), Seq.empty)).as[Option[Int]].collect()
    assert(none.forall(_.isEmpty))
    val got = df.select(GraftFunctions.firstContainsIndex(col("t"), Seq("def", "abc")))
      .as[Option[Int]].collect()
    assert(got(0).contains(0)) // first needle in GIVEN order wins, not position in text
    assert(got(1).isEmpty)
  }

  test("simhash64 of empty text is stable and distinct docs differ") {
    val df = Seq("", "totally different words here", "other content entirely").toDF("t")
    val got = df.select(GraftFunctions.simhash64(col("t"))).as[Long].collect()
    assert(got(1) != got(2))
  }

  test("ngramJaccardPairs on an empty corpus returns no rows") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(empty, "doc_id", "text", 1, 0.5).count() == 0)
    assert(Dedup.ngramJaccardPairs(empty, "doc_id", "text", 1, 0.95).count() == 0)
  }

  test("stringArrayExcludeSet: empty set, empty array, order preserved, null row") {
    val df = Seq(
      (1L, Seq("a", "b", "a", "c")),
      (2L, Seq.empty[String]),
      (3L, Seq("b", "b"))
    ).toDF("id", "ts")
    def run(exclude: Seq[String]) =
      df.select(col("id"), GraftFunctions.stringArrayExcludeSet(col("ts"), exclude))
        .as[(Long, Seq[String])].collect().toMap
    val none = run(Seq.empty)
    assert(none(1L) == Seq("a", "b", "a", "c") && none(2L).isEmpty)
    val got = run(Seq("b", "zz"))
    assert(got(1L) == Seq("a", "a", "c"))   // order kept, duplicates kept
    assert(got(2L).isEmpty && got(3L).isEmpty)
    // null array -> null out (nullSafeEval)
    val withNull = Seq((1L, Some(Seq("a"))), (2L, None))
      .toDF("id", "ts")
      .select(GraftFunctions.stringArrayExcludeSet(col("ts"), Seq("a")))
      .collect()
    assert(withNull(0).getSeq[String](0).isEmpty && withNull(1).isNullAt(0))
  }
}
