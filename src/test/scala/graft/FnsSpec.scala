package graft

import org.apache.spark.sql.functions._
import graft.functions.Fns

class FnsSpec extends SparkTestBase {
  import spark.implicits._

  test("dsum is exact and order-independent on 2-decimal doubles") {
    val df = Seq(0.1, 0.2, 0.3, 100.01, -0.61).toDF("x")
    val got = df.agg(Fns.dsum(col("x"))).as[Double].head()
    assert(got == 100.0) // naive double sum would give 100.00000000000001-ish
  }

  test("dsumDisc / dsumCharge match decimal-domain arithmetic") {
    val df = Seq((100.0, 0.1, 0.05), (50.0, 0.0, 0.0)).toDF("p", "d", "t")
    val disc = df.agg(Fns.dsumDisc(col("p"), col("d"))).as[Double].head()
    assert(disc == 90.0 + 50.0)
    val charge = df.agg(Fns.dsumCharge(col("p"), col("d"), col("t"))).as[Double].head()
    assert(charge == 94.5 + 50.0)
  }

  test("davg divides the decimal sum by the non-null count") {
    val df = Seq(Some(1.0), Some(2.0), None).toDF("x")
    assert(df.agg(Fns.davg(col("x"))).as[Double].head() == 1.5)
  }

  test("hoursBetween yields fractional hours") {
    val df = Seq(("2024-01-01 10:30:00", "2024-01-01 09:00:00")).toDF("out", "in")
    val got = df.select(Fns.hoursBetween(to_timestamp(col("out")), to_timestamp(col("in"))))
      .as[Double].head()
    assert(got == 1.5)
  }

  test("dateSpine is inclusive with 1-day step") {
    val n = spark.range(1).select(Fns.dateSpine("2024-02-27", "2024-03-02").as("d")).count()
    assert(n == 5) // leap year: 27,28,29,1,2
  }

  test("containsCI matches case-insensitively, dim-in-fact direction") {
    val df = Seq(("Dept of SALES", "sales"), ("HR", "sales")).toDF("fact", "dim")
    val got = df.select(Fns.containsCI(col("fact"), col("dim"))).as[Boolean].collect()
    assert(got.toSeq == Seq(true, false))
  }
}
