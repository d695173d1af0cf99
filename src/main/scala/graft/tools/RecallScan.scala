package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Recall, Similarity}

/** Parameter sweep for the approximate-similarity operators, measured with
  * the recall harness: for each (numPlanes, tables) LSH config and each
  * (nlist, nprobe) IVF config, print macro recall@k vs the exact baseline
  * plus the candidate volume (the cost driver). This is the tuning loop a
  * user runs before committing an ANN config at corpus scale.
  * Run: RecallScan <sfDir> [k]
  */
object RecallScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val n = e.count()
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k).cache()
    exact.count()

    println(f"corpus=$n%d k=$k (exact baseline cached)")
    println("-- LSH (numPlanes, tables) --")
    for (planes <- Seq(3, 4, 5, 6, 8); tables <- Seq(4, 8, 12, 16)) {
      val approx = Similarity.lshTopK(e, q, "vec_id", "embedding", k, planes, tables)
      val r = Recall.macroAvg(Recall.topKRecall(exact, approx))
      // expected fraction of the corpus probed per query (uniform buckets):
      // ~tables/2^planes — the cost driver to trade against recall
      val probeFrac = math.min(1.0, tables.toDouble / (1L << planes))
      println(f"planes=$planes%d tables=$tables%2d  recall@$k=$r%.3f  ~probeFrac=$probeFrac%.3f")
    }
    println("-- IVF (nlist, nprobe) --")
    for (nlist <- Seq(8, 16, 32); nprobe <- Seq(1, 2, 4, 8) if nprobe <= nlist) {
      val approx = Similarity.ivfTopK(e, q, "vec_id", "embedding", k, nlist, nprobe)
      val r = Recall.macroAvg(Recall.topKRecall(exact, approx))
      println(f"nlist=$nlist%2d nprobe=$nprobe%d  recall@$k=$r%.3f  probeFrac=${nprobe.toDouble / nlist}%.2f")
    }
    spark.stop()
  }
}
