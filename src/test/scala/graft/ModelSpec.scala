package graft

import graft.model.{Lineitem, Model}

class ModelSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("typed lineitem Dataset round-trips schema and supports typed ops") {
    val ds = Model.lineitems(spark, sf)
    val first: Lineitem = ds.orderBy($"l_orderkey", $"l_linenumber", $"l_partkey").head()
    assert(first.l_orderkey >= 0 && first.l_quantity > 0)
    // typed filter + map stay compile-checked
    val revenues = ds.filter(_.l_discount > 0.05)
      .map(l => l.l_extendedprice * (1 - l.l_discount))
    assert(revenues.count() > 0)
  }

  test("typed events carry LocalDateTime NTZ timestamps") {
    val e = Model.events(spark, sf).head()
    assert(e.ts.getYear == 2024)
  }

  test("typed embeddings expose float arrays") {
    val v = Model.embeddings(spark, sf).head()
    assert(v.embedding.length == 64)
  }
}
