package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("tokens handles empty/blank/multispace text") {
    val df = Seq("", "   ", "a  b\tc").toDF("t")
    val got = df.select(TextAnalysis.tokens(col("t"))).as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq(), Seq(), Seq("a", "b", "c")))
  }

  test("wordShingles n=1 is the distinct lowercase token set") {
    val df = Seq("The the THE fox").toDF("t")
    val got = df.select(TextAnalysis.wordShingles(col("t"), 1)).as[Seq[String]].head()
    assert(got == Seq("the", "fox"))
  }

  test("wordShingles n=3 slides a window; short docs yield empty") {
    val df = Seq("a b c d", "a b").toDF("t")
    val got = df.select(TextAnalysis.wordShingles(col("t"), 3)).as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a b c", "b c d"), Seq()))
  }

  test("langId picks the language with most stopword hits; und when none") {
    val df = Seq(
      "the cat is on the mat and it is happy",
      "el gato es un animal y la casa es grande",
      "zzz qqq xxx").toDF("t")
    val got = df.select(TextAnalysis.langId(col("t"))).as[String].collect().toSeq
    assert(got == Seq("en", "es", "und"))
  }

  test("fingerprint collides iff word bags match") {
    val df = Seq("b a c", "c b a", "a b d").toDF("t")
    val fps = df.select(TextAnalysis.fingerprint(col("t"))).as[String].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("bpeishTokenCount counts word runs plus punctuation") {
    val df = Seq("hello, world!").toDF("t")
    // hello , world ! -> 4
    assert(df.select(TextAnalysis.bpeishTokenCount(col("t"))).as[Int].head() == 4)
  }

  test("qualityFeatures ratios are exact and bounded") {
    val out = TextAnalysis.qualityFeatures(Seq((1L, "the cat sat.")).toDF("id", "text"), "text")
      .select("n_tokens", "punct_ratio", "quality_score")
      .as[(Int, Double, Double)].head()
    assert(out._1 == 3)
    assert(out._2 == 1.0 / 12.0)
    assert(out._3 >= 0.0 && out._3 <= 1.0)
  }

  test("winnowing guarantee: shared run of >= w+k-1 tokens => shared fingerprint") {
    val (k, w) = (3, 4)
    val shared = "alpha beta gamma delta epsilon zeta" // 6 tokens = w+k-1
    val docs = Seq(
      (1L, s"one two three $shared four five"),
      (2L, s"nine eight $shared seven six"),
      (3L, "completely different words with no overlap at all here")
    ).toDF("id", "text")
    val fps = TextAnalysis.winnowingFingerprints(docs, "text", k, w, "fps")
      .select("id", "fps")
      .as[(Long, Seq[String])].collect().toMap
    assert((fps(1L).toSet intersect fps(2L).toSet).nonEmpty) // the guarantee
    assert((fps(1L).toSet intersect fps(3L).toSet).isEmpty)  // disjoint text
    // density: ~2/(w+1) of grams get selected, never more than #windows
    assert(fps(1L).size <= 11 - k + 1)
  }

  test("winnowing edges: short docs degenerate to one fingerprint, tiny to none") {
    val docs = Seq(
      (1L, "just four tokens here"),  // 2 grams < w -> single global-min fp
      (2L, "two tokens"),             // < k tokens -> no grams -> no fps
      (3L, "")
    ).toDF("id", "text")
    val fps = TextAnalysis.winnowingFingerprints(docs, "text", 3, 4, "fps")
      .select("id", "fps")
      .as[(Long, Seq[String])].collect().toMap
    assert(fps(1L).size == 1)
    assert(fps(2L).isEmpty)
    assert(fps(3L).isEmpty)
  }

  test("contaminationScores: containment fraction vs a benchmark corpus") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a b c d"),        // 3-grams: "a b c", "b c d"
      (2L, "a b c x"),        // 3-grams: "a b c", "b c x"
      (3L, "p q r s"),        // disjoint from benchmark
      (4L, "a b")             // < 3 tokens -> no shingles -> omitted
    ).toDF("doc_id", "text")
    val bench = Seq("a b c d only").toDF("text") // grams include "a b c", "b c d"
    val got = TextAnalysis.contaminationScores(docs, "doc_id", "text", bench, "text", 3)
      .select(col("doc_id"), col("contamination"))
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.0, 2L -> 0.5, 3L -> 0.0))
  }

  test("redact scrubs emails, phone runs, and residual digit runs") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      "contact jane.doe+spam@ex-ample.co.uk now",
      "call +1 (555) 123-4567 today",
      "ref 123456789 is phone-shaped, pin 123456 is not, short 123 stays",
      "clean text"
    ).toDF("t")
    val got = df.select(TextAnalysis.redact(col("t"))).as[String].collect().toSeq
    assert(got(0) == "contact <EMAIL> now")
    assert(got(1) == "call <PHONE> today")
    // 8+ digit-ish runs read as phones; 4-7 digit runs fall through to <NUM>
    assert(got(2) == "ref <PHONE> is phone-shaped, pin <NUM> is not, short 123 stays")
    assert(got(3) == "clean text")
  }

  test("chunkTokens: overlapping windows, short-doc and empty-doc edges") {
    import org.apache.spark.sql.functions.col
    val toks = (1 to 95).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, toks), (2L, "a b c"), (3L, ""), (4L, "   ")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkTokens(df, "doc_id", "text", 50, 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(x => (x._1, x._2))
    // doc 1: starts 0, 40, 80 -> 50, 50, 15 tokens
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3)).toSeq == Seq((0, 50), (1, 50), (2, 15)))
    assert(d1(0)._4.startsWith("t1 t2 ") && d1(1)._4.startsWith("t41 "))
    assert(d1(2)._4 == (81 to 95).map(i => s"t$i").mkString(" "))
    // chunks overlap: last 10 tokens of chunk 0 reappear in chunk 1
    assert(d1(0)._4.endsWith("t50") && d1(1)._4.contains("t50"))
    // doc 2 fits in one short chunk; blank docs produce nothing
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0, 3, "a b c")))
    assert(!got.exists(c => c._1 == 3L || c._1 == 4L))
  }

  test("curationGate: first failing check wins; kept rows carry null reason") {
    val df = Seq(
      (1L, "the cat sat of the mat and it is that for sure, plainly"), // kept (en, long enough)
      (2L, "too short"),                                  // too_short before lang
      (3L, "el perro la casa de la calle y que en un una es por ahora si"), // lang (es)
      (4L, "!!!! ???? ;;;; :::: x1 y2 z3 w4 v5 u6")       // en-less -> lang 'und'
    ).toDF("doc_id", "text")
    val got = TextAnalysis.curationGate(df, "doc_id", "text",
        langs = Seq("en"), minQuality = 0.3, minTokens = 5, maxTokens = 1000)
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(4)), r.getBoolean(5))).sortBy(_._1)
    assert(got(0)._2 == "en" && got(0)._3.isEmpty && got(0)._4)
    assert(got(1)._3.contains("too_short") && !got(1)._4)
    assert(got(2)._2 == "es" && got(2)._3.contains("lang"))
    assert(got(3)._2 == "und" && got(3)._3.contains("lang"))
  }

  test("sequencePack: per-domain running-sum bins, boundary straddle goes down") {
    val df = Seq(
      (1L, "a " * 80, "x"), (2L, "b " * 80, "x"), (3L, "c " * 80, "x"),
      (4L, "d " * 10, "y"), (5L, "e " * 10, "y")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.sequencePack(df, "doc_id", "text", "source", 100)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).sortBy(_._1)
    // x: cum-before 0, 80, 160 -> bins 0, 0, 1 (doc 2 straddles 100, stays in 0)
    // y: independent partition restarts at bin 0
    assert(got.toSeq == Seq((1L, 80, 0L), (2L, 80, 0L), (3L, 80, 1L),
      (4L, 10, 0L), (5L, 10, 0L)))
  }

  test("normalizeText folds composed/decomposed forms; NFKC folds ligatures; cleanText chain") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val composed = "caf\u00e9"      // e-acute as ONE codepoint (NFC form)
    val decomposed = "cafe\u0301"   // e + combining acute (NFD form)
    val ligature = "\ufb01le"       // fi-ligature + "le" -> "file" under NFKC only
    val messy = "a\u0001b\u200b c  \t d" // control + zero-width + messy spaces
    val df = Seq((1L, composed), (2L, decomposed), (3L, ligature), (4L, messy))
      .toDF("id", "text")
    val nfc = df.select(col("id"), GraftFunctions.normalizeText(col("text"), "NFC").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nfc(1L) == composed && nfc(2L) == composed, "NFC unifies composed/decomposed")
    assert(nfc(3L) == ligature, "NFC preserves compatibility ligatures")
    val nfkc = df.select(col("id"), GraftFunctions.normalizeText(col("text"), "NFKC").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nfkc(3L) == "file", "NFKC folds the fi ligature")
    val clean = TextAnalysis.cleanText(df, "text", "t")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(clean(4L) == "a b c d", s"got '${clean(4L)}'")
    assert(clean(2L) == composed)
    // NFC and NFD inputs now hash identically -- the dedup motivation
    assert(clean(1L) == clean(2L))
  }

  test("pmiCollocations: a true collocation outranks a chance co-occurrence") {
    // "new york" always co-occurs; "the" pairs with everything (chance)
    val docs = (1 to 20).map(i => (i.toLong, s"the new york times item$i the end"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, "text", minCount = 5, topK = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    val m = got.toMap
    assert(m.contains(("new", "york")) && m(("new", "york"))._1 == 20L)
    // "the new" has the same count but "the" is frequent everywhere -> lower PMI
    assert(m(("new", "york"))._2 > m(("the", "new"))._2)
    // ranks are pmi-descending
    val pmis = got.map(_._2._2)
    assert(pmis.sameElements(pmis.sorted.reverse))
  }

  test("repetitionScores: degenerate text scores high, varied text scores low") {
    val df = Seq(
      (1L, "spam spam spam spam"),        // 1 distinct token, all 2-grams equal
      (2L, "the quick brown fox jumps"),  // all distinct
      (3L, "a b a b a b"),                // alternating: 2-grams repeat
      (4L, "   "),                        // blank -> no row
      (5L, "solo")                        // one token -> no 2-grams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionScores(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(!got.contains(4L))
    assert(got(1L) == ((4L, 1.0, 0.25, 1.0 - 1.0 / 3))) // 3 grams, 1 distinct
    assert(got(2L) == ((5L, 0.2, 1.0, 0.0)))
    val (n3, top3, dist3, dup3) = got(3L)
    assert(n3 == 6L && top3 == 0.5 && dist3 == 2.0 / 6)
    assert(math.abs(dup3 - 3.0 / 5) < 1e-15)        // 5 grams, 2 distinct
    assert(got(5L) == ((1L, 1.0, 1.0, 0.0)))        // no grams -> ratio 0
  }

  test("pruneHotTokens: strips Zipf head, preserves order, handles edge docs") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog barked"),
      (3L, "the end"),
      (4L, "cat dog"),
      (5L, "")                             // empty stays a row, stays empty
    ).toDF("doc_id", "text")
    // "the" is in 3/5 docs (df=3 > 0.5*5=2.5); everything else df<=2
    val got = TextAnalysis.pruneHotTokens(df, "doc_id", "text", 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(got(1L) == ((6, 4, "cat sat on mat")))   // both "the"s removed, order kept
    assert(got(2L) == ((3, 2, "dog barked")))
    assert(got(3L) == ((2, 1, "end")))
    assert(got(4L) == ((2, 2, "cat dog")))           // untouched
    assert(got(5L) == ((0, 0, "")))
    // document whose every token is hot prunes to empty string, not null
    val all = Seq((1L, "x y"), (2L, "x y"), (3L, "x y")).toDF("doc_id", "text")
    val g2 = TextAnalysis.pruneHotTokens(all, "doc_id", "text", 0.5)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    assert(g2.forall(_ == ((2, 0, ""))))
    // threshold above every df -> no hot set -> identity rewrite
    val g3 = TextAnalysis.pruneHotTokens(df, "doc_id", "text", 1.0)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(g3(1L) == "the cat sat on the mat")
    // the model-parameter guard trips on an oversized hot set
    intercept[IllegalArgumentException] {
      TextAnalysis.pruneHotTokens(all, "doc_id", "text", 0.5, maxHotTokens = 1)
    }
  }

  test("tokenEntropy: uniform beats skewed, single-token group scores zero") {
    val df = Seq(
      ("u", "a b c d"),              // uniform over 4 -> ln(4)
      ("s", "a a a b"),              // skewed -> below ln(2)... above 0
      ("z", "x x x x"),              // single token -> 0
      ("e", "   ")                   // no tokens -> no row
    ).toDF("src", "text")
    val got = TextAnalysis.tokenEntropy(df, "src", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(!got.contains("e"))
    assert(got("u")._1 == 4L && got("u")._2 == 4L)
    assert(math.abs(got("u")._3 - math.log(4.0)) < 1e-5)
    assert(got("z")._3 == 0.0)
    // H(3/4, 1/4) = ln4 - (3 ln3)/4
    val hs = math.log(4.0) - 3.0 * math.log(3.0) / 4.0
    assert(math.abs(got("s")._3 - hs) < 1e-5)
    assert(got("s")._3 > 0.0 && got("s")._3 < got("u")._3)
  }

  test("duplicatedTextFraction: corpus-wide >=2 marks positions; short/null docs 0") {
    val df = Seq(
      (1L, "abcdefgh"),   // grams: abcd bcde cdef defg efgh
      (2L, "xxabcdef"),   // grams: xxab xabc abcd bcde cdef — 3 shared with doc 1
      (3L, "zz"),         // shorter than L -> zero grams
      (4L, "ppppp"),      // pppp twice WITHIN one doc -> still duplicated
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.duplicatedTextFraction(df, "doc_id", "text", 4)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, 3L, 3.0 / 5.0),
      (2L, 5L, 3L, 3.0 / 5.0),
      (3L, 0L, 0L, 0.0),
      (4L, 2L, 2L, 1.0),
      (5L, 0L, 0L, 0.0)))
  }

  test("duplicatedCharCoverage merges overlapping intervals; within-doc repeats count") {
    val df = Seq(
      // abcd/bcde repeat at positions 1,2 and 8,9 -> union [1,5]+[8,12] = 10
      (1L, "abcdexxabcde"),
      (2L, "zzz"),                 // shorter than L
      (3L, "qqqqq"),               // qqqq at 1,2 WITHIN one doc -> [1,5] = all 5
      (4L, "mnopqrstuv"),          // no duplicated grams
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.duplicatedCharCoverage(df, "doc_id", "text", 4)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 12L, 10L, 10.0 / 12.0),
      (2L, 3L, 0L, 0.0),
      (3L, 5L, 5L, 1.0),
      (4L, 10L, 0L, 0.0),
      (5L, 0L, 0L, 0.0)))
  }

  test("topDuplicatedGrams: occurrence + distinct-doc counts, count-then-gram order") {
    val df = Seq((1L, "abcdefgh"), (2L, "xxabcdef"), (4L, "ppppp"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.topDuplicatedGrams(df, "doc_id", "text", 4, 10)
      .as[(String, Long, Long)].collect().toSeq
    // all counts tie at 2 -> gram lexicographic order; pppp is 2 occurrences
    // in ONE doc (n_docs = 1); singletons are absent entirely
    assert(got == Seq(("abcd", 2L, 2L), ("bcde", 2L, 2L),
      ("cdef", 2L, 2L), ("pppp", 2L, 1L)))
    val top2 = TextAnalysis.topDuplicatedGrams(df, "doc_id", "text", 4, 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(top2 == Seq(("abcd", 2L, 2L), ("bcde", 2L, 2L)))
  }

  test("chunkDedupRewrite: corpus-wide first occurrence survives, docs rewritten in order") {
    import spark.implicits._
    // chunkSize 2; tokens chosen so:
    //  - doc 1's chunk "a b" is the corpus-wide first occurrence
    //  - doc 2 repeats "a b" (cross-doc dup) and has a unique tail chunk "e"
    //  - doc 3 repeats its OWN chunk "x y" twice (within-doc dup)
    //  - doc 4 is entirely duplicate chunks -> rewritten to empty
    //  - doc 5 is empty text -> 0 chunks, empty rewrite
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b e"),
      (3L, "x y x y"),
      (4L, "a b c d"),
      (5L, "")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis
      .chunkDedupRewrite(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, "a b c d", 2, 2),
      (2L, "e", 1, 2),
      (3L, "x y", 1, 2),
      (4L, "", 0, 2),
      (5L, "", 0, 0)))
  }

  test("chunkDedupRewrite: within-doc order is by chunk index, not text order") {
    import spark.implicits._
    val docs = Seq((1L, "z z a a m m")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis
      .chunkDedupRewrite(docs, "doc_id", "text", 2).collect()
    assert(out.head.getString(1) === "z z a a m m")
  }

  test("chunkIndexIngest: incremental waves equal the batch rewrite; replay keeps zero chunks") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),      // corpus
      (2L, "a b e f"),      // wave A: "a b" already admitted
      (3L, "e f g h"),      // wave B: "e f" admitted by wave A
      (4L, "g h g h")).toDF("doc_id", "text") // wave B: within-doc repeat
    val idx = java.nio.file.Files.createTempDirectory("graft_chunk_idx").toString
    graft.ext.TextAnalysis.buildChunkIndex(
      docs.filter(col("doc_id") === 1), "doc_id", "text", 2, idx)
    val waveA = graft.ext.TextAnalysis.chunkIndexIngest(spark, idx,
      docs.filter(col("doc_id") === 2), "doc_id", "text", 2)
    val waveB = graft.ext.TextAnalysis.chunkIndexIngest(spark, idx,
      docs.filter(col("doc_id") > 2), "doc_id", "text", 2)
    val incremental = waveA.unionByName(waveB)
    val full = graft.ext.TextAnalysis.chunkDedupRewrite(docs, "doc_id", "text", 2)
      .filter(col("doc_id") > 1)
    assert(rows(incremental) === rows(full))
    assert(rows(waveA) === Set(Seq(2L, "e f", 1, 2)))
    // replay: every chunk of waveB is already admitted
    val replay = graft.ext.TextAnalysis.chunkIndexIngest(spark, idx,
      docs.filter(col("doc_id") > 2), "doc_id", "text", 2)
    assert(replay.filter(col("n_kept") > 0).count() == 0)
    // compaction folds the replayed hash appends to the distinct set
    graft.ext.TextAnalysis.chunkIndexCompact(spark, idx)
    val hashes = spark.read.parquet(s"$idx/chunks")
    assert(hashes.count() == hashes.distinct().count())
  }

  test("chunkIndexAdmit commits atomically: crashed partial admits invisible, replayed token a no-op") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft_chunk_atomic").toString
    val base = Seq((1L, "a b c d")).toDF("doc_id", "text")
    TextAnalysis.buildChunkIndex(base, "doc_id", "text", 2, idx)
    val committed = () => spark.read
      .option("recursiveFileLookup", "true").parquet(s"$idx/chunks").count()
    val afterBuild = committed()

    // a crash BEFORE the commit rename leaves only a temp dir — its
    // hashes must be invisible to the probe (this is the partial-admit
    // window: a probe that saw them would rewrite the replayed batch
    // partially and clobber the complete store partition)
    val batch = Seq((2L, "e f g h")).toDF("doc_id", "text")
    val surv = TextAnalysis.chunkIndexProbe(spark, idx, batch,
      "doc_id", "text", 2).localCheckpoint()
    surv.limit(1).select(col("chash"))
      .write.mode("overwrite").parquet(s"$idx/chunks_admit_tmp_batch7")
    assert(committed() == afterBuild) // partial temp not visible
    assert(TextAnalysis.chunkIndexProbe(spark, idx, batch,
      "doc_id", "text", 2).count() == 2) // probe still sees both as novel

    // the replayed admit overwrites the crashed temp and commits ALL
    // of the batch's hashes with one rename
    TextAnalysis.chunkIndexAdmit(surv, idx, admitToken = "batch7")
    assert(committed() == afterBuild + 2)
    assert(TextAnalysis.chunkIndexProbe(spark, idx, batch,
      "doc_id", "text", 2).count() == 0)

    // an admit replayed AFTER its commit landed is a no-op — no
    // duplicate hashes, no second directory
    TextAnalysis.chunkIndexAdmit(surv, idx, admitToken = "batch7")
    assert(committed() == afterBuild + 2)

    // compact folds admit dirs flat and sweeps orphaned temp dirs
    surv.limit(1).select(col("chash"))
      .write.mode("overwrite").parquet(s"$idx/chunks_admit_tmp_orphan")
    TextAnalysis.chunkIndexCompact(spark, idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/chunks_admit_tmp_orphan")))
    val flat = spark.read.parquet(s"$idx/chunks")
    assert(flat.count() == afterBuild + 2 && flat.distinct().count() == flat.count())
  }

  test("cdcChunkDedupRewrite is shift-robust where fixed windows are not") {
    import spark.implicits._
    // doc 2 = doc 1 with ONE token prepended: every fixed 10-token window
    // of doc 2 is shifted, so the fixed-window pass dedups nothing; the
    // content-defined boundaries re-synchronize after the first boundary
    // token, so most of doc 2's chunks dedup against doc 1's.
    val base = (1 to 80).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, "inserted " + base)).toDF("doc_id", "text")
    val fixed = graft.ext.TextAnalysis
      .chunkDedupRewrite(docs, "doc_id", "text", 10)
      .filter(col("doc_id") === 2).head()
    assert(fixed.getInt(2) === fixed.getInt(3),
      "fixed windows: every shifted chunk of doc 2 is novel (nothing dedups)")
    val cdc = graft.ext.TextAnalysis
      .cdcChunkDedupRewrite(docs, "doc_id", "text")
      .filter(col("doc_id") === 2).head()
    assert(cdc.getInt(2) < cdc.getInt(3),
      s"cdc: downstream chunks must dedup (kept ${cdc.getInt(2)} of ${cdc.getInt(3)})")
    // and the surviving rewrite of an UNCHANGED duplicate is empty text
    val dup = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val full = graft.ext.TextAnalysis.cdcChunkDedupRewrite(dup, "doc_id", "text")
      .filter(col("doc_id") === 2).head()
    assert(full.getString(1) === "" && full.getInt(2) === 0)
  }

  test("cdcChunks: boundary token ends its chunk; concatenation round-trips; empty text yields none") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h i j k l"), (2L, "")).toDF("doc_id", "text")
    val ch = graft.ext.TextAnalysis.cdcChunks(docs, "doc_id", "text")
      .orderBy("doc_id", "chunk_id").collect()
    assert(ch.forall(_.getLong(0) == 1L))
    // chunks concatenate back to the original token stream, in order
    assert(ch.map(_.getString(2)).mkString(" ") === "a b c d e f g h i j k l")
    // every non-final chunk ends in a boundary token (md5 first hex in 0..1)
    val md = java.security.MessageDigest.getInstance("MD5")
    def isB(t: String): Boolean = {
      val h = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      h.charAt(0) == '0' || h.charAt(0) == '1'
    }
    ch.dropRight(1).foreach { r =>
      val last = r.getString(2).split(" ").last
      assert(isB(last), s"chunk '${r.getString(2)}' must end in a boundary token")
    }
  }
}
