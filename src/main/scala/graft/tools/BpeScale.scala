package graft.tools

import org.apache.spark.sql.SparkSession

/** Batched-BPE measurement at REAL vocabulary scale — the q245 catalog
  * entry pins numMerges=256 / batchK=64 (4 driver rounds); this times
  * the path a 32 k-vocabulary trainer actually takes: numMerges ≥ 4096
  * with the largest practical batchK. The per-round merge application is
  * a CHAIN of `accepted.size` expression stages over one array column,
  * so batchK is bounded by expression/codegen depth (~128 is safe;
  * beyond that the planner cost grows superlinearly) — rounds =
  * ceil(numMerges / accepted-per-round), where acceptance can fall below
  * batchK when the round's top pairs share symbols (conflict
  * starvation, reported here as rounds-taken vs the ideal). The corpus
  * can also EXHAUST (every word fully merged) before numMerges — the
  * merge count achieved is the honest result then.
  *
  * Usage: `BpeScale [sfDir] [numMerges] [batchK]`
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(4096)
    val batchK = args.lift(2).map(_.toInt).getOrElse(128)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
    val secs = (1 to 2).map { i =>
      val t = System.nanoTime()
      val merges = graft.ext.TextAnalysis
        .bpeMerges(d, "text", numMerges, batchK).collect()
      val sec = (System.nanoTime() - t) / 1e9
      println(f"run$i: $sec%.1f s merges=${merges.length} " +
        f"(ideal rounds=${math.ceil(numMerges.toDouble / batchK).toInt})")
      sec
    }
    // conservation identity at this scale (the q246 oracle's invariant:
    // the check emits rows only on violation)
    val violations = graft.ext.TextAnalysis
      .bpeConservationCheck(d, "text", numMerges, batchK).count()
    println(f"RESULT numMerges=$numMerges batchK=$batchK " +
      f"warm=${secs.min}%.1f s conservation=" +
      (if (violations == 0) "HOLDS" else s"VIOLATED ($violations rows)"))
    spark.stop()
  }
}
