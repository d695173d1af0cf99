package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

/** BPE vocabulary induction: the classic Sennrich hand-traceable corpus
  * ({low:5, lower:2, newest:6, widest:3}), plus tie-break, termination,
  * apply-by-lookup, and conservation checks.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def sennrich = Seq(
    (1L, ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).trim))
    .toDF("doc_id", "text")

  test("bpeMerges learns the hand-traced Sennrich merge sequence") {
    val m = TextAnalysis.bpeMerges(sennrich, "text", 5)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    // pair counts: (e,s)=9 (newest 6 + widest 3) ties (s,t)=9 → 'e'<'s';
    // then (es,t)=9; then (l,o)=7 ties (o,w)=7 → 'l'<'o'; then (lo,w)=7;
    // then (e,w)/(n,e)/(w,est) all 6 → 'e' wins with (e,w)
    assert(m.toSeq === Seq(
      (1, "e", "s", "es", 9L, 9L),
      (2, "es", "t", "est", 9L, 9L),
      (3, "l", "o", "lo", 7L, 7L),
      (4, "lo", "w", "low", 7L, 7L),
      (5, "e", "w", "ew", 6L, 6L)))
  }

  test("greedy apply does not reuse a consumed symbol on overlapping runs") {
    // 'aaa' ×2: adjacency count 4, but greedy left-to-right applies once
    // per word → applied 2; second merge fuses (aa,a)
    val df = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeMerges(df, "text", 2).orderBy("rank").collect()
    assert(m(0).getString(3) === "aa" && m(0).getLong(4) === 4L &&
      m(0).getLong(5) === 2L)
    assert(m(1).getString(1) === "aa" && m(1).getString(2) === "a" &&
      m(1).getLong(5) === 2L)
  }

  test("argmax tie-break is (count desc, left asc, right asc)") {
    val df = Seq((1L, "ab ba")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeMerges(df, "text", 1).collect()
    assert(m.length === 1 && m(0).getString(3) === "ab")
  }

  test("training terminates early when every word is a single symbol") {
    val df = Seq((1L, "x y z x")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeMerges(df, "text", 10).count() === 0L)
    val ab = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // one merge collapses 'ab'; nothing left to fuse afterwards
    assert(TextAnalysis.bpeMerges(ab, "text", 10).count() === 1L)
  }

  test("bpePairCounts row 1 is the first learned merge; counts are instance-weighted") {
    val top = TextAnalysis.bpePairCounts(sennrich, "text", 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(top.head === (("e", "s", 9L)))
    // (w,e) totals 8: 2 from lower + 6 from newest
    assert(top.toSeq === Seq(("e", "s", 9L), ("s", "t", 9L), ("w", "e", 8L)))
  }

  test("bpeTokenCounts re-tokenizes by lookup under the learned merges") {
    // after 4 merges (es, est, lo, low): low→[low]=1, lower→[low,e,r]=3,
    // newest→[n,e,w,est]=4, widest→[w,i,d,est]=4
    val docs = Seq(
      (1L, "low lower"), (2L, "newest widest newest"), (3L, "   "),
      (4L, ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).trim))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeTokenCounts(docs, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got(0) === ((1L, 2L, 4L, 8L)))       // 1+3 tokens, 3+5 chars
    assert(got(1) === ((2L, 3L, 12L, 18L)))     // 4+4+4 tokens
    assert(got(2) === ((3L, 0L, 0L, 0L)))       // blank text → zeros
    assert(got(3) === ((4L, 16L, 5 * 1L + 2 * 3L + 6 * 4L + 3 * 4L,
      5 * 3L + 2 * 5L + 6 * 6L + 3 * 6L)))
  }

  test("conservation: applied counts telescope to initial minus final symbols") {
    val df = Seq((1L, "aaa aaa ab low lower newest")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeConservationCheck(df, "text", 6).count() === 0L)
  }

  test("merge application is word-local: merges never cross word boundaries") {
    // 'a b' has no adjacent pair (separate words) — only 'cd' can merge
    val df = Seq((1L, "a b cd cd cd")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeMerges(df, "text", 5).collect()
    assert(m.length === 1 && m(0).getString(3) === "cd")
  }

  test("batched induction: per-round merges are symbol-disjoint, counts are round-start, conservation holds") {
    // Sennrich corpus, batchK=3: round 1's counts are (e,s)=9 (s,t)=9
    // (l,o)=7 (o,w)=7 (w,e)=8 ... — acceptance in (cnt desc, a, b) order
    // with symbol-disjointness: (e,s) accepted; (s,t) conflicts on 's';
    // (w,e) conflicts on 'e'; (l,o) accepted; (o,w) conflicts on 'o';
    // next non-conflicting candidates fill slot 3.
    val m = TextAnalysis.bpeMerges(sennrich, "text", 6, batchK = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(m(0) === ((1, "e", "s", 9L)))
    assert(m(1) === ((2, "l", "o", 7L)))
    // within every round of 3, accepted symbol sets are pairwise disjoint
    m.grouped(3).foreach { round =>
      val sets = round.map { case (_, a, b, _) => Set(a, b, a + b) }
      for (i <- sets.indices; j <- sets.indices if i < j)
        assert((sets(i) & sets(j)).isEmpty,
          s"round merges must be symbol-disjoint: ${round.toSeq}")
    }
    // the telescoping identity is merge-order-independent
    assert(TextAnalysis.bpeConservationCheck(
      sennrich, "text", 6, batchK = 3).count() === 0L)
    // batchK larger than the whole merge budget still terminates and
    // exhausts cleanly
    val tiny = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeMerges(tiny, "text", 10, batchK = 64).count() === 1L)
  }

  test("batchK=1 batched path is exactly the sequential greedy sequence") {
    val seqForm = TextAnalysis.bpeMerges(sennrich, "text", 5)
      .orderBy("rank").collect().map(_.toSeq)
    val batched = TextAnalysis.bpeMerges(sennrich, "text", 5, batchK = 1)
      .orderBy("rank").collect().map(_.toSeq)
    assert(seqForm.toSeq === batched.toSeq)
  }

  test("driver dispatch equals the distributed loop merge-row by merge-row") {
    // corpora chosen to stress every decision the two routes must share:
    // argmax ties (equal counts broken on UTF-8 binary order), overlapping
    // runs (greedy non-reuse), batched disjoint acceptance with the 4k+16
    // over-collect truncation, multi-char fused symbols re-entering the
    // count, early exhaustion, and non-ASCII symbols (é is two UTF-8
    // bytes — byte order must match UTF8String's, not UTF-16's)
    val corpora = Seq(
      sennrich,
      Seq((1L, "aaa aaa ab ba")).toDF("doc_id", "text"),
      Seq((1L, "héllo héllo wörld wörld wörld zz")).toDF("doc_id", "text"),
      Seq((1L, "x y z"), (2L, "ab ab cd cd cd ef")).toDF("doc_id", "text"))
    for (df <- corpora; batchK <- Seq(1, 3)) {
      val driver = TextAnalysis.bpeMerges(df, "text", 8, batchK)
        .orderBy("rank").collect().map(_.toSeq).toSeq
      spark.conf.set("spark.graft.bpe.driverVocabRows", "0")
      val dist =
        try TextAnalysis.bpeMerges(df, "text", 8, batchK)
          .orderBy("rank").collect().map(_.toSeq).toSeq
        finally spark.conf.unset("spark.graft.bpe.driverVocabRows")
      assert(driver === dist, s"routes diverged (batchK=$batchK)")
    }
    // the final per-word segmentation (the vocab the lookup path joins
    // against) must agree too — bpeTokenCounts rides it
    val docs = corpora(2)
    val driverCounts = rows(
      TextAnalysis.bpeTokenCounts(docs, "doc_id", "text", 6))
    spark.conf.set("spark.graft.bpe.driverVocabRows", "0")
    val distCounts =
      try rows(TextAnalysis.bpeTokenCounts(docs, "doc_id", "text", 6))
      finally spark.conf.unset("spark.graft.bpe.driverVocabRows")
    assert(driverCounts === distCounts)
  }
}
