package graft

import org.apache.spark.sql.functions._
import graft.ext.Imputation

class ImputationSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq((1, -1.0), (2, 10.0), (3, 20.0), (4, -5.0)).toDF("id", "x")

  test("mean imputation over non-missing rows") {
    val got = Imputation.impute(df, "x", Imputation.Mean, col("x") < 0)
      .select("id", "x_imputed").as[(Int, Double)].collect().toMap
    assert(got(1) == 15.0 && got(4) == 15.0 && got(2) == 10.0)
  }

  test("median imputation") {
    val d = Seq((1, -1.0), (2, 1.0), (3, 2.0), (4, 100.0)).toDF("id", "x")
    val got = Imputation.impute(d, "x", Imputation.Median, col("x") < 0)
      .select("id", "x_imputed").as[(Int, Double)].collect().toMap
    assert(got(1) == 2.0)
  }

  test("mode imputation breaks ties by smallest value") {
    val d = Seq((1, "?"), (2, "b"), (3, "a"), (4, "b"), (5, "a")).toDF("id", "x")
    val got = Imputation.imputeMode(d, "x", col("x") === "?")
      .select("id", "x_imputed").as[(Int, String)].collect().toMap
    assert(got(1) == "a") // a and b both occur twice; smallest wins
  }

  test("mlImpute (spark.ml bridge) fills nulls with the mean") {
    val d = Seq((1, Some(10.0)), (2, None), (3, Some(20.0))).toDF("id", "x")
    val got = Imputation.mlImpute(d, Seq("x"))
      .select("id", "x_imputed").as[(Int, Double)].collect().toMap
    assert(got(2) == 15.0 && got(1) == 10.0)
  }

  test("grouped mean imputation uses the row's group") {
    val d = Seq(("g1", -1.0), ("g1", 10.0), ("g2", -1.0), ("g2", 30.0)).toDF("g", "x")
    val got = Imputation.imputeGroupMean(d, "x", Seq("g"), col("x") < 0)
      .select("g", "x_imputed").as[(String, Double)].collect().toSet
    assert(got == Set(("g1", 10.0), ("g2", 30.0)))
  }
}
