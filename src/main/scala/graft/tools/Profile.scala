package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextAnalysis}
import graft.functions.GraftFunctions

/** Ad-hoc stage profiler for the heavy pairwise queries — counts each
  * intermediate of the prefix-filter Jaccard pipeline with wall times so
  * optimization targets facts, not guesses. Not part of the driver
  * contract; run: Profile <sfDir> [q25|q26|q27].
  */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val extra = r match { case n: Long => f"  rows=$n%,d"; case _ => "" }
    System.err.println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s$extra")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "q25"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")

    val (n, threshold) = which match {
      case "q26" => (3, 0.1)
      case _     => (1, 0.8)
    }

    if (which == "q27") {
      // mirror the shipped minhashLshPairs paths: the general banded
      // pipeline stage by stage (candidates + distinct + fetch verify),
      // then the tiny-universe BNLJ alternative, then the production
      // dispatch end-to-end (which picks between them)
      val sets = docs.repartition(col("doc_id"))
        .select(col("doc_id").as("id"), Dedup.hashedShingles(col("text"), 1).as("sh"))
        .filter(size(col("sh")) > 0)
        .withColumn("skey", xxhash64(col("sh")))
      val reps = sets.groupBy(col("skey"))
        .agg(min_by(col("sh"), col("id")).as("sh"))
        .withColumn("sh_size", size(col("sh")))
      time("reps")(reps.count())
      val sig = reps.select(col("skey"), col("sh"), col("sh_size"),
        GraftFunctions.minhash(col("sh"), 64).as("sig"))
      time("signatures")(sig.count())
      val r = 4
      val withBuckets = sig.withColumn("buckets", transform(sequence(lit(0), lit(15)),
        b => xxhash64(lit("band"), b, array_join(slice(col("sig"), b * r + 1, lit(r)), ","))))
      // --- general (banded) path stages ---
      val banded = withBuckets
        .select(col("skey"), col("sh_size"), posexplode(col("buckets")))
        .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
      time("banded")(banded.count())
      val l = banded.select(col("band"), col("bucket"), col("skey").as("skey_a"), col("sh_size").as("size_a"))
      val rgt = banded.select(col("band"), col("bucket"), col("skey").as("skey_b"), col("sh_size").as("size_b"))
      val feasible = l.join(rgt, Seq("band", "bucket"))
        .filter(col("skey_a") < col("skey_b") &&
          col("size_b") >= col("size_a") * lit(0.8) &&
          col("size_a") >= col("size_b") * lit(0.8))
      time("banded: size-feasible")(feasible.count())
      val cand = feasible.select("skey_a", "skey_b").distinct()
      time("banded: distinct candidates")(cand.count())
      // --- production dispatch end-to-end: on a tiny-universe corpus this
      // routes to the BNLJ (verify-first popcount + band membership), so
      // comparing it against the banded stages above shows what the
      // dispatch saves; on a big-vocab corpus it IS the banded pipeline ---
      time("full lsh pairs (dispatch)")(
        Dedup.minhashLshPairs(docs, "doc_id", "text", 1, 64, 16, 0.8).count())
      spark.stop(); return
    }

    if (which == "q26c") {
      // mirror the counted (low-threshold) set-pair path stage by stage
      val sets = docs.repartition(col("doc_id"))
        .select(col("doc_id").as("id"), Dedup.hashedShingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .withColumn("skey", xxhash64(col("sh")))
      time("sets count")(sets.count())
      val reps = sets.groupBy(col("skey"))
        .agg(min_by(col("sh"), col("id")).as("sh"))
        .withColumn("sh_size", size(col("sh")))
      time("reps count")(reps.count())
      val inv = reps.select(col("skey"), col("sh_size"), explode(col("sh")).as("s"))
      time("inv count")(inv.count())
      val a = inv.select(col("s"), col("skey").as("skey_a"), col("sh_size").as("sz_a"))
      val b = inv.select(col("s"), col("skey").as("skey_b"), col("sh_size").as("sz_b"))
      val joined = a.join(b, Seq("s")).filter(col("skey_a") < col("skey_b"))
      time("raw count join")(joined.count())
      val pairs = joined.groupBy("skey_a", "skey_b", "sz_a", "sz_b")
        .agg(count(lit(1)).as("common"))
        .withColumn("jaccard",
          col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")))
        .filter(col("jaccard") >= 0.1)
      time("set pairs")(pairs.count())
      time("end-to-end")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.1).count())
      spark.stop(); return
    }

    val shingled = docs.select(
      col("doc_id").as("id"),
      Dedup.hashedShingles(col("text"), n).as("sh"))
      .withColumn("sh_size", size(col("sh")))
      .filter(col("sh_size") > 0)
    time("shingled count")(shingled.count())
    val inv = shingled.select(col("id"), col("sh_size"), explode(col("sh")).as("s"))
    time("inv count")(inv.count())
    val dfreq = inv.groupBy("s").agg(count(lit(1)).as("df"))
    time("dfreq count")(dfreq.count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df").asc, col("s").asc)
    val prefix = inv.join(dfreq, Seq("s"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("sh_size") - ceil(col("sh_size") * lit(threshold)) + 1)
    time("prefix count")(prefix.count())
    val a = prefix.select(col("s"), col("id").as("id_a"), col("sh_size").as("sz_a"))
    val b = prefix.select(col("s"), col("id").as("id_b"), col("sh_size").as("sz_b"))
    val rawCand = a.join(b, Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("sz_b") >= ceil(col("sz_a") * lit(threshold)) &&
              col("sz_a") >= ceil(col("sz_b") * lit(threshold)))
    time("raw candidate join count")(rawCand.count())
    val candidates = rawCand.select("id_a", "id_b").distinct()
    time("distinct candidates")(candidates.count())
    val full = shingled.select(col("id"), col("sh"))
    val verified = candidates
      .join(full.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(full.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("common", GraftFunctions.sortedIntersectSize(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("common").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .filter(col("jaccard") >= threshold)
    time("verified pairs")(verified.count())
    verified.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Sort "))
      .foreach(l => System.err.println("[plan] " + l.trim.take(150)))
    time("end-to-end (no reuse)")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n, threshold).count())
    spark.stop()
  }
}
