package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

/** WordPiece-style tokenizer: substring-vocabulary induction and greedy
  * longest-match encoding, both checked against naive in-memory
  * re-implementations (the catalog's q198/q199 add the cross-engine
  * DuckDB oracle on the real corpus).
  */
class WordPieceSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "unbelievable unbelievable belief"),
    (2L, "the the the believer"),
    (3L, "un un believable"),
    (4L, ""), // no tokens: must report zeros
    (5L, "a")
  ).toDF("doc_id", "text")

  /** Naive substring counts over the word quotient (lowercased,
    * whitespace-split), frequency-weighted, per-word multiplicity counted.
    */
  private def naiveCounts(texts: Seq[String], maxLen: Int): Map[String, Long] = {
    val words = texts.flatMap(t => t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
    val m = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- words; i <- 0 until w.length;
         l <- 1 to math.min(maxLen, w.length - i)) {
      val p = w.substring(i, i + l)
      m(p) = m.getOrElse(p, 0L) + f
    }
    m.toMap
  }

  private def naiveVocab(texts: Seq[String], maxLen: Int, k: Int): Map[String, Long] = {
    val counts = naiveCounts(texts, maxLen)
    val chars = counts.filter(_._1.length == 1)
    val multi = counts.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(k)
    chars ++ multi
  }

  /** Greedy longest-match piece count over one word. */
  private def naivePieces(w: String, vocab: Set[String], maxLen: Int): Int = {
    var pos = 0; var n = 0
    while (pos < w.length) {
      var len = math.min(maxLen, w.length - pos)
      while (len > 1 && !vocab.contains(w.substring(pos, pos + len))) len -= 1
      // single chars are always in the vocabulary (coverage guarantee)
      pos += len; n += 1
    }
    n
  }

  test("substringVocab matches the naive frequency-weighted counts and top-k tie-break") {
    val texts = docs.as[(Long, String)].collect().toSeq.map(_._2)
    for ((maxLen, k) <- Seq((4, 5), (8, 20))) {
      val expected = naiveVocab(texts, maxLen, k)
      val got = TextAnalysis.substringVocab(docs, "text", maxLen, k)
        .select("piece", "cnt").as[(String, Long)].collect().toMap
      assert(got == expected, s"maxLen=$maxLen k=$k")
      // piece_len is derived, not trusted
      val lens = TextAnalysis.substringVocab(docs, "text", maxLen, k)
        .select("piece", "piece_len").as[(String, Int)].collect()
      assert(lens.forall { case (p, l) => p.length == l })
    }
  }

  test("wordpieceTokenCounts matches the naive greedy walk, zeros for empty docs") {
    val maxLen = 4; val k = 6
    val rows = docs.as[(Long, String)].collect().toSeq
    val vocab = naiveVocab(rows.map(_._2), maxLen, k).keySet
    val expected = rows.map { case (id, t) =>
      val ws = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      (id, ws.size.toLong,
        ws.map(w => naivePieces(w, vocab, maxLen).toLong).sum,
        ws.map(_.length.toLong).sum)
    }.toSet
    val got = TextAnalysis.wordpieceTokenCounts(docs, "doc_id", "text", maxLen, k)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(got.contains((4L, 0L, 0L, 0L))) // the empty doc reports zeros
  }

  test("multi-char pieces strictly reduce the piece count on repetitive corpora") {
    // 'ab' repeated: with vocab including multi-char pieces the piece count
    // must be < the char count; with k=0 multi-char pieces... k >= 1, so
    // compare against the char-only LOWER bound n_word_chars instead
    val rep = Seq((1L, "ababab ababab abab")).toDF("doc_id", "text")
    val got = TextAnalysis.wordpieceTokenCounts(rep, "doc_id", "text", 4, 8)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got._3 < got._4, "multi-char matches must beat char-level segmentation")
    assert(got._3 >= Math.ceil(got._4 / 4.0).toLong, "pieces bounded below by chars/maxLen")
  }

  test("pointer-doubled walk handles words at and past the doubling horizon") {
    // one long word (31 chars) forces several doubling rounds; a single
    // char word terminates in round zero
    val lw = "abcdefghijklmnopqrstuvwxyzabcde"
    val df = Seq((1L, s"$lw x")).toDF("doc_id", "text")
    val maxLen = 3; val k = 4
    val vocab = naiveVocab(Seq(s"$lw x"), maxLen, k).keySet
    val expPieces = naivePieces(lw, vocab, maxLen).toLong + 1L // + "x"
    val got = TextAnalysis.wordpieceTokenCounts(df, "doc_id", "text", maxLen, k)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((1L, 2L, expPieces, lw.length.toLong + 1L)))
  }
}
