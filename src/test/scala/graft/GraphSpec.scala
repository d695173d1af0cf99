package graft

import org.apache.spark.sql.functions._
import graft.ext.Graph

/** Integer micro-unit PageRank: hand-traced path graph, mass accounting,
  * clique symmetry, and the determinism the unrolled oracle relies on.
  */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def pathGraph = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")

  test("pageRank reproduces the hand-traced path-graph recurrence") {
    // a-b-c, N=3: base=50000, init=333333; two exact integer iterations
    val r = Graph.pageRank(pathGraph, iterations = 2)
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq === Seq((1L, 312083L), (2L, 375834L), (3L, 312083L)))
  }

  test("one iteration matches the first hand-traced step") {
    val r = Graph.pageRank(pathGraph, iterations = 1)
      .orderBy("id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq === Seq((1L, 191667L), (2L, 616666L), (3L, 191667L)))
  }

  test("clique members all carry identical rank; mass stays within rounding") {
    val clique = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val r = Graph.pageRank(clique, iterations = 5).collect()
    val micros = r.map(_.getLong(1)).toSet
    assert(micros.size === 1)
    // every node rounds at most ±0.5 micro twice per iteration
    assert(math.abs(r.map(_.getLong(1)).sum - 1000000L) <= 3 * 2 * 5)
  }

  test("rank column is exactly micro / 1e6") {
    val r = Graph.pageRank(pathGraph, iterations = 2).collect()
    r.foreach(x => assert(x.getDouble(2) === x.getLong(1).toDouble / 1e6))
  }

  test("isolated nodes are absent; disconnected pairs rank independently") {
    // two disjoint 2-cliques: symmetric ranks, 4 rows
    val g = Seq((1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val r = Graph.pageRank(g, iterations = 3)
      .orderBy("id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.length === 4)
    assert(r(0)._2 === r(1)._2 && r(2)._2 === r(3)._2 && r(0)._2 === r(2)._2)
  }

  test("repeated runs are bit-identical (integer arithmetic, no FP drift)") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("id_a", "id_b")
    val a = Graph.pageRank(g, iterations = 8).orderBy("id").collect().toSeq
    val b = Graph.pageRank(g, iterations = 8).orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("driver dispatch equals the distributed loop bit-for-bit") {
    // asymmetric-degree graph (star + tail + clique) so term/contrib
    // rounding differs node by node — any arithmetic divergence between
    // the routes shows up in rank_micro, which is compared EXACTLY
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 5L), (2L, 3L)).toDF("id_a", "id_b")
    for (iters <- Seq(1, 8)) {
      val driver = Graph.pageRank(g, iters).orderBy("id")
        .collect().map(_.toSeq).toSeq
      spark.conf.set("spark.graft.pagerank.driverEdgeRows", "0")
      val dist =
        try Graph.pageRank(g, iters).orderBy("id").collect().map(_.toSeq).toSeq
        finally spark.conf.unset("spark.graft.pagerank.driverEdgeRows")
      assert(driver === dist, s"routes diverged at iterations=$iters")
    }
  }
}
