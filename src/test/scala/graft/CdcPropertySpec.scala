package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis
import graft.functions.GraftFunctions

/** Randomized (seeded, deterministic) differential tests: the CDC
  * chunk-dedup pipeline and the PQ encode kernel each checked against an
  * INDEPENDENT driver-side reference implementation on generated inputs —
  * a regression net beyond the hand-picked fixtures, in the spirit of
  * round 11's hamming-family property test.
  */
class CdcPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260816L)

  // -- driver-side reference: tokenize, md5-boundary chunk, global
  // first-occurrence dedup by (doc, chunk index), rebuild ------------------
  private def refChunks(text: String): Seq[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def isBoundary(tok: String): Boolean = {
      val h = md.digest(tok.getBytes("UTF-8"))
      ((h(0) & 0xff) >>> 4) < 2
    }
    val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = scala.collection.mutable.ArrayBuffer.empty[String]
    toks.foreach { t =>
      cur += t
      if (isBoundary(t)) { out += cur.mkString(" "); cur.clear() }
    }
    if (cur.nonEmpty) out += cur.mkString(" ")
    out.toSeq
  }

  private def refRewrite(docs: Seq[(Long, String)]): Map[Long, (String, Int, Int)] = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    docs.sortBy(_._1).map { case (id, text) =>
      val chunks = refChunks(text)
      val kept = chunks.filter(c => seen.add(c))
      id -> (kept.mkString(" "), kept.length, chunks.length)
    }.toMap
  }

  test("cdcChunkDedupRewrite matches the driver-side reference on 60 random corpora") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi")
    (1 to 60).foreach { trial =>
      val nDocs = 1 + rnd.nextInt(6)
      val docs = (1 to nDocs).map { i =>
        val n = rnd.nextInt(40)
        val toks = Seq.fill(n)(vocab(rnd.nextInt(vocab.length)))
        (i.toLong, toks.mkString(" "))
      }
      val expected = refRewrite(docs)
      val got = TextAnalysis
        .cdcChunkDedupRewrite(docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3)))
        .toMap
      assert(got === expected, s"trial $trial: docs=$docs")
    }
  }

  test("pqEncode matches a driver-side argmin-L2 reference on 200 random vectors") {
    val m = 4
    val ksub = 5
    val dsub = 3
    val books: Array[Array[Array[Float]]] = Array.fill(m) {
      Array.fill(ksub)(Array.fill(dsub)(rnd.nextFloat() * 2 - 1))
    }
    val vecs = Seq.fill(200)(Array.fill(m * dsub)(rnd.nextFloat() * 2 - 1))
    def refEncode(v: Array[Float]): Seq[Byte] =
      (0 until m).map { j =>
        val cands = books(j).zipWithIndex.map { case (c, ci) =>
          val d = (0 until dsub).map { i =>
            val df = v(j * dsub + i).toDouble - c(i).toDouble
            df * df
          }.sum
          (d, ci)
        }
        // strict-less argmin: ties keep the smaller code
        cands.minBy(_._1)._2.toByte
      }
    val got = vecs.map(Tuple1(_)).toDF("v")
      .select(GraftFunctions.pqEncode(col("v"), books).as("c"))
      .collect().map(_.getAs[Array[Byte]](0).toSeq)
    assert(got === vecs.map(refEncode))
  }

  test("pq ADC inner product equals the driver-side LUT sum on random codes") {
    val m = 3
    val ksub = 4
    val books: Array[Array[Array[Float]]] = Array.fill(m) {
      Array.fill(ksub)(Array.fill(2)(rnd.nextFloat()))
    }
    val q = Array.fill(m * 2)(rnd.nextFloat())
    val codes = Seq.fill(50)(Array.fill(m)(rnd.nextInt(ksub).toByte))
    def refLut: Array[Double] = (0 until m).flatMap { j =>
      (0 until ksub).map { c =>
        (0 until 2).map(i => q(j * 2 + i).toDouble * books(j)(c)(i).toDouble).sum
      }
    }.toArray
    def refAdc(cs: Array[Byte]): Double =
      cs.zipWithIndex.map { case (c, j) => refLut(j * ksub + (c & 0xff)) }.sum
    val got = codes.map(c => (c, q)).toDF("codes", "qv")
      .select(GraftFunctions.pqAdcDot(col("codes"),
        GraftFunctions.pqLut(col("qv"), books), ksub).as("s"))
      .collect().map(_.getDouble(0))
    got.zip(codes.map(refAdc)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12)
    }
  }
}
