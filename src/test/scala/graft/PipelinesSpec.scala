package graft

import java.nio.file.Files
import graft.pipeline.Pipelines

class PipelinesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("imputations pipeline emits only keys absent from the prior window") {
    val out = Pipelines.imputations(spark, sf,
      from = "1998-06-01", to = "1998-09-01", loadedFrom = "1998-01-01")
    assert(out.count() > 0)
    assert(out.columns.toSeq ==
      Seq("s_suppkey", "fecha", "tipo", "horas", "precio_min", "n_lineas"))
  }

  test("fichajes pipeline enriches with 'No asignado' defaults") {
    val out = Pipelines.fichajes(spark, sf)
    assert(out.count() > 0)
    assert(out.filter(out("empleado") === "No asignado").count() >= 0)
  }

  test("loadImputations is idempotent across re-runs") {
    val dir = Files.createTempDirectory("graft_pipe").toString + "/fact"
    val n1 = Pipelines.loadImputations(spark, sf,
      "1998-06-01", "1998-09-01", "1998-01-01", dir)
    assert(n1 > 0)
    val n2 = Pipelines.loadImputations(spark, sf,
      "1998-06-01", "1998-09-01", "1998-01-01", dir)
    assert(n2 == 0) // re-running the same window inserts nothing
    assert(spark.read.parquet(dir).count() == n1)
  }
}
