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
}
