package graft

import org.apache.spark.sql.functions._
import graft.ext.Mixing

class MixingSpec extends SparkTestBase {
  import spark.implicits._

  // 60 a / 30 b / 10 c — deliberately NOT the target mixture
  private def corpus = (
    (1 to 60).map(i => (i.toLong, "a")) ++
    (61 to 90).map(i => (i.toLong, "b")) ++
    (91 to 100).map(i => (i.toLong, "c"))).toDF("id", "dom")

  test("mixtureSample: exact target proportions, scarcest weighted domain consumed whole") {
    // N = floor(min(60/0.5, 30/0.4, 10/0.1)) = floor(min(120, 75, 100)) = 75
    val got = Mixing.mixtureSample(corpus, "id", "dom",
      Map("a" -> 0.5, "b" -> 0.4, "c" -> 0.1))
    val byDom = got.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom == Map("a" -> 37L, "b" -> 30L, "c" -> 7L)) // floor(w*75)
    // deterministic: same call, same member set
    val again = Mixing.mixtureSample(corpus, "id", "dom",
      Map("a" -> 0.5, "b" -> 0.4, "c" -> 0.1))
    assert(rows(got) == rows(again))
  }

  test("mixtureSample drops domains outside the recipe") {
    val got = Mixing.mixtureSample(corpus, "id", "dom", Map("a" -> 0.7, "b" -> 0.3))
    assert(got.filter(col("dom") === "c").count() == 0)
  }

  test("mixtureRepeats: repeat counts sum to the per-domain quotas; scarce domain upsamples") {
    // target 200: quotas a=100 (base 1 rem 40), b=60 (base 2 rem 0), c=40 (base 4 rem 0)
    val got = Mixing.mixtureRepeats(corpus, "id", "dom",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), 200L)
    val sums = got.groupBy("dom").agg(sum("n_repeats").as("s"))
      .as[(String, Long)].collect().toMap
    assert(sums == Map("a" -> 100L, "b" -> 60L, "c" -> 40L))
    // every corpus row of a recipe domain is present (0-repeat rows audit the drops)
    assert(got.count() == 100)
    val cRepeats = got.filter(col("dom") === "c").select("n_repeats")
      .as[Long].collect().toSet
    assert(cRepeats == Set(4L))
  }

  test("mixtureRepeats: subsampling domain gets 0/1 repeats") {
    // target 50: quota a = floor(0.9*50)=45 < 60 docs -> base 0, rem 45
    val got = Mixing.mixtureRepeats(corpus, "id", "dom",
      Map("a" -> 0.9, "c" -> 0.1), 50L)
    val aRep = got.filter(col("dom") === "a").select("n_repeats").as[Long].collect()
    assert(aRep.count(_ == 1L) == 45 && aRep.count(_ == 0L) == 15)
  }

  test("mixtureTokenSample: budgets bound per-domain tokens; boundary doc included") {
    val df = corpus.withColumn("toks", lit(10))
    // budgets: a = 0.5*400 = 200 tokens = 20 docs of 10; c = 0.1*400 = 40 -> 4 docs
    val got = Mixing.mixtureTokenSample(df, "id", "dom", org.apache.spark.sql.functions.col("toks"),
      Map("a" -> 0.5, "b" -> 0.4, "c" -> 0.1), 400L)
    val byDom = got.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom == Map("a" -> 20L, "b" -> 16L, "c" -> 4L))
    // a 1-token overshoot still takes the boundary doc: budget 25 with
    // 10-token docs -> cum 10,20,30; the 30 row has cum-n=20 < 25 -> 3 docs
    val small = Mixing.mixtureTokenSample(df, "id", "dom", org.apache.spark.sql.functions.col("toks"),
      Map("c" -> 1.0), 25L)
    assert(small.count() == 3)
  }

  test("invalid recipes are rejected") {
    intercept[IllegalArgumentException] {
      Mixing.mixtureSample(corpus, "id", "dom", Map("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Mixing.mixtureSample(corpus, "id", "dom", Map("a" -> 0.5, "zz" -> 0.5))
    }
  }

  test("temperatureSample flattens toward sqrt shares, exact budgets, deterministic") {
    // head domain 400 docs, tail domain 100: natural shares 0.8/0.2,
    // sqrt shares 2:1 -> 2/3 vs 1/3 of the budget
    val df = ((1 to 400).map(i => (i.toLong, "head")) ++
      (401 to 500).map(i => (i.toLong, "tail"))).toDF("id", "dom")
    val got = Mixing.temperatureSample(df, "id", "dom", 90L)
    val byDom = got.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact integer budgets: wu = (20e6, 10e6), W = 30e6;
    // head = floor(90*2/3 + .5) = 60, tail = floor(90/3 + .5) = 30
    assert(byDom == Map("head" -> 60L, "tail" -> 30L))
    // budget capped at the pool: tiny domain consumed whole, never inflated
    val tiny = df.filter(col("dom") === "tail").limit(5)
      .unionByName(df.filter(col("dom") === "head"))
    val g2 = Mixing.temperatureSample(tiny, "id", "dom", 400L)
      .groupBy("dom").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g2("tail") <= 5L)
    // deterministic id set across runs
    val again = Mixing.temperatureSample(df, "id", "dom", 90L)
    assert(got.collect().toSet == again.collect().toSet)
  }

  test("temperatureSample alpha sweep: sqrt-exact powers, monotone flattening") {
    val df = ((1 to 400).map(i => (i.toLong, "head")) ++
      (401 to 500).map(i => (i.toLong, "tail"))).toDF("id", "dom")
    def shares(alpha: Double): Map[String, Long] =
      Mixing.temperatureSample(df, "id", "dom", 90L, alpha)
        .groupBy("dom").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // α=0.75: wμ = (89442719, 31622777) -> head 66, tail 24
    assert(shares(0.75) == Map("head" -> 66L, "tail" -> 24L))
    // α=0.25: wμ = (4472136, 3162278) -> head 53, tail 37
    assert(shares(0.25) == Map("head" -> 53L, "tail" -> 37L))
    // lower α flattens harder: head budget strictly decreases toward uniform
    assert(shares(0.75)("head") > shares(0.5)("head"))
    assert(shares(0.5)("head") > shares(0.25)("head"))
    // powers outside the sqrt-exact set are rejected, not approximated
    intercept[IllegalArgumentException] {
      Mixing.temperatureSample(df, "id", "dom", 90L, alpha = 0.6)
    }
  }

  test("temperatureSample budget math survives Long-overflow-scale budgets") {
    // 2·T·wμ overflows a Long here (T ~ 2^61, wμ ~ 2e7): the BigInt
    // derivation must cap every domain at its pool instead of silently
    // going negative and sampling zero rows (the old Long-math failure)
    val df = ((1 to 40).map(i => (i.toLong, "a")) ++
      (41 to 50).map(i => (i.toLong, "b"))).toDF("id", "dom")
    val got = Mixing.temperatureSample(df, "id", "dom", Long.MaxValue / 4)
      .groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 40L, "b" -> 10L))
  }

  test("topPByWeight: strict prefix rule, crossing row included") {
    val df = Seq(
      (1L, "a", 0.9, 50L), (2L, "a", 0.8, 30L),
      (3L, "a", 0.7, 15L), (4L, "a", 0.6, 5L)).toDF("id", "dom", "s", "wt")
    // p=80: cum-before 0, 50, 80, 95 — keep while 100·cb < 80·100
    val got80 = Mixing.topPByWeight(df, "id", "dom", "s", "wt", 80)
      .select("id").as[Long].collect().toSet
    assert(got80 == Set(1L, 2L))
    // p=60: id 2's cum-before is 50 < 60 — the crossing row is KEPT,
    // so the kept weight (80) overshoots the 60% budget by design
    val got60 = Mixing.topPByWeight(df, "id", "dom", "s", "wt", 60)
      .select("id").as[Long].collect().toSet
    assert(got60 == Set(1L, 2L))
    // p=1: the best row always survives (cum-before 0)
    val got1 = Mixing.topPByWeight(df, "id", "dom", "s", "wt", 1)
      .select("id").as[Long].collect().toSet
    assert(got1 == Set(1L))
  }

  test("topPByWeight: bit-identical to the naive global window, ties and clamp") {
    import org.apache.spark.sql.expressions.Window
    // scores quantized to 2dp (many ties), include exact 0.0 and 1.0
    // (bucket clamp), three domains, weights 1..7, some excluded rows
    val base = (1 to 300).map { i =>
      (i.toLong, s"d${i % 3}", ((i * 37) % 101) / 100.0, (1 + i % 7).toLong)
    }.toDF("id", "dom", "s", "wt")
    val df = base.unionByName(Seq(
      (1001L, "d0", 0.5, 0L),                      // zero weight: excluded
      (1002L, "d1", 0.5, -3L),                     // negative: excluded
      (1003L, "d2", Double.NaN, 5L)).toDF("id", "dom", "s", "wt")
      .withColumn("s", when(col("id") === 1003L, lit(null).cast("double"))
        .otherwise(col("s"))))                     // null score: excluded
    val p = 55
    val w = Window.partitionBy(col("dom")).orderBy(col("s").desc, col("id").asc)
    val naive = df.filter(col("wt") > 0 && col("s").isNotNull)
      .withColumn("cb", coalesce(sum(col("wt")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("tot", sum(col("wt")).over(Window.partitionBy(col("dom"))))
      .filter(lit(100) * col("cb") < col("tot") * p)
      .select(col("id"), col("dom"), col("wt").as("weight"))
    val got = Mixing.topPByWeight(df, "id", "dom", "s", "wt", p)
    assert(rows(got) == rows(naive))
    assert(got.filter(col("id") >= 1000L).count() == 0)
    // p=100 keeps every includable row
    val all = Mixing.topPByWeight(df, "id", "dom", "s", "wt", 100)
    assert(all.count() == 300)
  }

  test("topPByWeight: NaN scores are excluded like NULLs") {
    // NaN sorts ABOVE every double in (s DESC) but floor(NaN·256) casts to
    // bucket 0 — the two-phase path and a naive window would disagree on
    // where it lands, so the contract excludes it outright (ADVICE r9)
    val df = Seq(
      (1L, "a", 0.9, 10L), (2L, "a", 0.5, 10L), (3L, "a", 0.1, 10L),
      (4L, "a", Double.NaN, 100L)).toDF("id", "dom", "s", "wt")
    val got = Mixing.topPByWeight(df, "id", "dom", "s", "wt", 50)
      .select("id").as[Long].collect().toSet
    // NaN row neither appears nor spends budget: tot=30, keep cb<15 -> ids 1,2
    assert(got == Set(1L, 2L))
  }

  test("topPByWeight: constant-score domain stays bounded (degenerate distribution)") {
    // 100k rows, ONE domain, every score identical — the shape that
    // collapsed the whole domain into one boundary-bucket window before
    // the two-level cumulate. Selection must stay exact AND the row-level
    // window must partition by the id-range chunk, never the whole domain.
    val n = 100000
    val df = spark.range(1, n + 1).select(
      col("id"), lit("web").as("dom"), lit(1.0).as("s"), lit(1L).as("wt"))
    val got = Mixing.topPByWeight(df, "id", "dom", "s", "wt", 50)
    // all scores tie -> order is id ASC; keep iff 100·(i−1) < 50·n
    assert(got.count() == n / 2)
    val ids = got.select(max(col("id")).as("m"), min(col("id")).as("l"))
      .as[(Long, Long)].head()
    assert(ids == ((n / 2).toLong, 1L))
    // structural: the boundary row-level window partitions by the chunk
    // column __c (id-range sub-chunks), so no window partition is ever a
    // whole constant-score domain
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("__c"))
    // chunk width for ids 1..100k: (100000 div 256) - 0 + 1 = 391 ->
    // every chunk ≤ 391 rows; recompute the operator's chunk key and
    // assert the bound holds over the whole domain
    val maxChunk = df.select((col("id") / lit(391)).cast("long").as("c"))
      .groupBy("c").count().agg(max("count")).as[Long].head()
    assert(maxChunk <= 391L)
  }

  test("topPByWeight: quantized scores + string ids fall back per exact score, still exact") {
    // non-integral id type: the id-range chunk degenerates to one chunk
    // per exact score — quantized (few-distinct) scores still avoid the
    // whole-domain window, and the output stays bit-identical to naive
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 500).map { i =>
      (f"doc$i%04d", "a", (i % 4) / 4.0, (1 + i % 5).toLong)
    }.toDF("id", "dom", "s", "wt")
    val p = 40
    val w = Window.partitionBy(col("dom")).orderBy(col("s").desc, col("id").asc)
    val naive = df
      .withColumn("cb", coalesce(sum(col("wt")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("tot", sum(col("wt")).over(Window.partitionBy(col("dom"))))
      .filter(lit(100) * col("cb") < col("tot") * p)
      .select(col("id"), col("dom"), col("wt").as("weight"))
    // boundaryWindowRows=1 forces the chunk recursion (500 rows would
    // otherwise take the small-bucket direct window since the r11 gate)
    val got = Mixing.topPByWeight(df, "id", "dom", "s", "wt", p,
      boundaryWindowRows = 1)
    assert(rows(got) == rows(naive))
  }

  test("topPByWeight: negative and extreme long ids chunk monotonically") {
    // truncating `div` must stay order-consistent across the sign
    // boundary; exactness is the witness
    import org.apache.spark.sql.expressions.Window
    val df = ((-250 to 249).map { i =>
      (i.toLong * 1000003L, "a", 0.5, (1 + math.abs(i) % 3).toLong)
    }).toDF("id", "dom", "s", "wt")
    val p = 30
    val w = Window.partitionBy(col("dom")).orderBy(col("s").desc, col("id").asc)
    val naive = df
      .withColumn("cb", coalesce(sum(col("wt")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("tot", sum(col("wt")).over(Window.partitionBy(col("dom"))))
      .filter(lit(100) * col("cb") < col("tot") * p)
      .select(col("id"), col("dom"), col("wt").as("weight"))
    // force the recursion path (see string-id test)
    val got = Mixing.topPByWeight(df, "id", "dom", "s", "wt", p,
      boundaryWindowRows = 1)
    assert(rows(got) == rows(naive))
  }

  test("topPByWeight: small-bucket gate and chunk recursion agree bit-for-bit") {
    // same ties-and-clamp shape as the naive-equivalence test: the gated
    // direct window (default threshold) and the forced recursion
    // (threshold 1) must produce the identical member set — the gate is a
    // pure cost decision, never a semantic one
    val df = (1 to 400).map { i =>
      (i.toLong, s"d${i % 2}", ((i * 53) % 97) / 96.0, (1 + i % 5).toLong)
    }.toDF("id", "dom", "s", "wt")
    for (p <- Seq(1, 37, 80, 100)) {
      val direct = Mixing.topPByWeight(df, "id", "dom", "s", "wt", p)
      val recursed = Mixing.topPByWeight(df, "id", "dom", "s", "wt", p,
        boundaryWindowRows = 1)
      assert(rows(direct) == rows(recursed), s"gate changed selection at p=$p")
    }
  }

  test("weightedReservoir: bit-identical to the naive single-window A-ES form") {
    val df = (1 to 3000).map(i => (i.toLong, s"d${i % 3}", (i % 17) + 1L))
      .toDF("id", "dom", "w")
    val naive = df
      .withColumn("__u",
        (conv(substring(md5(col("id").cast("string").cast("binary")), 1, 13),
          16, 10).cast("long") + lit(0.5)) / lit(4503599627370496.0))
      .withColumn("__key", log(col("__u")) / col("w"))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("dom"))
          .orderBy(col("__key").desc, col("id").asc)))
      .filter(col("__rk") <= 7)
      .select(col("id"), col("dom"), col("w").as("weight"))
    val got = Mixing.weightedReservoir(df, "id", "dom", "w", 7)
    assert(rows(got) == rows(naive))
    assert(got.count() == 21)
  }

  test("weightedReservoir: overwhelming weight is always selected; zero/null weights never") {
    val df = ((1 to 500).map(i => (i.toLong, "d", 1L)) :+
      (9999L, "d", 100000000L) :+ (10000L, "d", 0L))
      .toDF("id", "dom", "w")
      .withColumn("w", when(col("id") === 10000L, lit(null)).otherwise(col("w")))
    val kept = Mixing.weightedReservoir(df, "id", "dom", "w", 10)
      .select("id").as[Long].collect().toSet
    // P(heavy row misses top-10 of 501) < 1e-300 with w-ratio 1e8
    assert(kept.contains(9999L))
    assert(!kept.contains(10000L))
    assert(kept.size == 10)
  }
}
