package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus replication for scale testing: writes a `factor`× copy of the
  * documents / embeddings / lineitem / orders tables with each copy
  * DECORRELATED from the others, so the duplicate / neighbor structure of
  * the source corpus is preserved per copy but no artificial cross-copy
  * structure is created:
  *
  *  - documents: copy c > 0 suffixes every token with `~c` — intra-copy
  *    Jaccard/MinHash/edit structure is IDENTICAL to the source (same token
  *    multiset shape), cross-copy token overlap is zero (a naive 10× text
  *    replica would instead give every document 9 exact clones and inflate
  *    pair counts ~100×, measuring the wrong thing);
  *  - embeddings: copy c flips the sign of dimension i iff
  *    xxhash64(c, i) is odd — norms and intra-copy cosines are exactly
  *    preserved, cross-copy cosines decorrelate to ~0;
  *  - lineitem / orders: key-space shift per copy (orderkey/custkey +
  *    c·10⁷) so join fan-out and group cardinalities scale linearly.
  *
  * Used for the sf1 scaling measurement (BASELINE.md addendum): run the
  * scale-path queries at sf0.1 and at this 10× replica and compare the
  * observed wall-time exponent against the linear-ideal.
  *
  * Usage: `graft.ScaleUp <inDir> <outDir> <factor>`
  */
object ScaleUp {
  private val Off = 10000000L

  /** Per-copy decorrelating transforms; copy 0 is the identity. */
  def scaleDocuments(docs: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { c =>
      if (c == 0) docs
      else docs.select(
        (col("doc_id") + c * Off).as("doc_id"),
        // salt on the SAME whitespace tokenization the shinglers use (runs
        // of whitespace, empties dropped): a raw split(" ") would turn the
        // empty tokens of irregular whitespace into real "~c" tokens and
        // break the intra-copy-structure-identical invariant
        array_join(transform(
          filter(split(trim(col("text")), "\\s+"), t => t =!= ""),
          t => concat(t, lit(s"~$c"))), " ").as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")))
        .select("doc_id", "text", "lang", "source", "n_chars")
    }.reduce(_ unionByName _)

  def scaleEmbeddings(emb: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { c =>
      if (c == 0) emb
      else emb.select(
        (col("vec_id") + c * Off).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(pmod(xxhash64(lit(c), i), lit(2)) === 0, x).otherwise(-x))
          .cast("array<float>").as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)

  def scaleLineitem(li: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { c =>
      if (c == 0) li
      else li
        .withColumn("l_orderkey", col("l_orderkey") + c * Off)
        .withColumn("l_partkey", col("l_partkey") + c * Off)
        .withColumn("l_suppkey", col("l_suppkey") + c * Off)
    }.reduce(_ unionByName _)

  def scaleOrders(o: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { c =>
      if (c == 0) o
      else o
        .withColumn("o_orderkey", col("o_orderkey") + c * Off)
        .withColumn("o_custkey", col("o_custkey") + c * Off)
    }.reduce(_ unionByName _)

  /** Replicate the event stream as 10× TRAFFIC, not 10× history: copy c
    * shifts event_id and user_id (distinct actors per copy — session and
    * cohort structure per user is identical to the source) and leaves `ts`
    * unchanged, so every day/window carries factor× events — the shape a
    * stream actually takes at scale (more concurrent traffic in the same
    * retention window). Day-grain aggregates keep their output cardinality
    * while their inputs scale; sessionization scales in users.
    */
  def scaleEvents(ev: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { c =>
      if (c == 0) ev
      else ev
        .withColumn("event_id", col("event_id") + c * Off)
        .withColumn("user_id", col("user_id") + c * Off)
    }.reduce(_ unionByName _)

  /** Replicate a dim with its primary key shifted per copy, other columns
    * unchanged — keeps the replica's fact FKs RESOLVABLE (a fact row of
    * copy c joins its copy's dim row), so dim-join queries measure real
    * join work instead of silently dropping 1−1/factor of their probes.
    */
  def scaleDim(dim: DataFrame, keyCol: String, factor: Int): DataFrame =
    (0 until factor).map { c =>
      if (c == 0) dim
      else dim.withColumn(keyCol, col(keyCol) + c * Off)
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1 && factor * 1L * Off < Long.MaxValue / 4, "sane factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Session.local(cpus, appName = "graft-scaleup")
    spark.sparkContext.setLogLevel("WARN")
    def t(n: String) = graft.sources.Tables.load(spark, inDir, n)
    // key-space guard: ids must fit below the per-copy offset, or copies
    // collide (chained ScaleUp runs would alias copy c of id d with copy
    // c+1 of id d−Off and manufacture artificial cross-copy structure)
    Seq("documents" -> "doc_id", "embeddings" -> "vec_id",
        "orders" -> "o_orderkey", "lineitem" -> "l_orderkey",
        "part" -> "p_partkey", "supplier" -> "s_suppkey",
        "customer" -> "c_custkey", "events" -> "event_id").foreach { case (tbl, k) =>
      val mx = t(tbl).agg(max(col(k))).head().getLong(0)
      require(mx < Off, s"ScaleUp: max($tbl.$k)=$mx >= offset $Off — " +
        "scaling this input would collide key spaces across copies")
    }
    def write(df: DataFrame, n: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$n.parquet")
    write(scaleDocuments(t("documents"), factor), "documents")
    write(scaleEmbeddings(t("embeddings"), factor), "embeddings")
    write(scaleLineitem(t("lineitem"), factor), "lineitem")
    write(scaleOrders(t("orders"), factor), "orders")
    write(scaleEvents(t("events"), factor), "events")
    // dims referenced by the scaled facts replicate with shifted keys so
    // every copy's FKs resolve; region/nation are genuinely global dims
    // (nationkeys unchanged in customer/supplier copies) and pass through
    write(scaleDim(t("part"), "p_partkey", factor), "part")
    write(scaleDim(t("supplier"), "s_suppkey", factor), "supplier")
    write(scaleDim(t("customer"), "c_custkey", factor), "customer")
    Seq("region", "nation").foreach(n => write(t(n), n))
    spark.stop()
  }
}

/** Times a named subset of the catalog on a given sf dir (the flagship
  * scale-path queries for the scaling measurement) — Bench's protocol
  * (noop sink, warmup pass) without dragging the full catalog through an
  * sf1-sized run. Usage: `graft.ScaleBench <sfDir> <q...>`.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    // trailing k=v args become session confs (A/B a conf-gated path)
    val names = args.tail.toSeq.filterNot(_.contains("="))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Session.local(cpus, appName = "graft-scalebench")
    spark.sparkContext.setLogLevel("WARN")
    args.tail.filter(_.contains("=")).foreach { a =>
      val Array(k, v) = a.split("=", 2)
      spark.conf.set(k, v)
    }
    // same warmup discipline as Bench: codegen/JIT at sf0.001, then one
    // untimed query at the target dir for executor ramp + page cache
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    try SparkEntry.queries(names.head)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // failures are NOT timings: a crash (or typo'd name) must never emit a
    // bogus near-zero number that could be read as a scaling measurement
    val results = names.flatMap { n =>
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[scalebench] $n FAILED: $e"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      if (ok) { System.err.println(f"[scalebench] $n%-26s $sec%8.2f s"); Some(n -> sec) }
      else None
    }
    val failed = names.filterNot(results.map(_._1).toSet)
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(results.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString(s"""{"sf":"$sfDir","failed":${failed.size},"queries":{""", ",", "}}"))
    spark.stop()
  }
}
