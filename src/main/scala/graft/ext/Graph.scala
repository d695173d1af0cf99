package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over pair graphs (the near-dup pair sets the
  * dedup family produces): PageRank centrality next to
  * [[Dedup.connectedComponents]]' cluster labels. Components answer "which
  * documents form one duplicate cluster"; PageRank answers "which member is
  * most central" — the canonical-selection signal when clusters are big and
  * quality scores tie, and the importance weight for graph-aware sampling.
  *
  * Everything here runs in INTEGER MICRO-UNITS (1 rank = 1e6 micro): each
  * per-node value is a BIGINT, every division/damping step rounds through
  * `floor(x + 0.5)` on doubles whose magnitudes stay far below 2^53, and
  * sums are plain BIGINT sums — accumulation-order-independent and
  * bit-identical on any cluster AND in DuckDB, which is what lets an
  * 8-iteration PageRank be hash-compared against an oracle that unrolls the
  * same recurrence as nested CTEs (q186). The float-typed `rank` column is
  * derived from the micro value at the very end.
  */
object Graph {

  /** PageRank by power iteration over an UNDIRECTED pair graph.
    *
    * `pairs` carries one row per unordered edge (id_a, id_b); it is
    * symmetrized internally, so every endpoint has out-degree >= 1 and no
    * dangling-mass correction is needed. Nodes are the DISTINCT endpoints
    * of the pair set — isolated documents carry no graph signal and are
    * deliberately absent (join the result back `left` and
    * `coalesce(rank, base)` if a full-corpus column is wanted).
    *
    * Per iteration, with N = node count and damping d:
    *   term(v)    = round(rank_micro(v) / outdeg(v))
    *   contrib(u) = Σ_{v -> u} term(v)                 (BIGINT sum)
    *   rank'(u)   = base_micro + round(d · contrib(u))
    * where base_micro = round((1-d) · 1e6 / N) and round(x) =
    * floor(x + 0.5). The damping factor enters ONLY as the literal
    * constants `d` and `1-d` supplied by the caller's formula (0.85 / 0.15
    * by default) — never computed as `1.0 - d` at runtime, because
    * `1.0 - 0.85` is not the double the literal `0.15` parses to, and the
    * oracle parses literals.
    *
    * Scale shape: the rank frame is node-sized; each iteration is one
    * equi-join of the symmetrized edge list against the per-node terms
    * (shuffle keyed on the 8-byte node id; AQE broadcasts the term frame
    * when it fits) plus one hash aggregate on the destination — the
    * standard distributed-PageRank shuffle pair, nothing edge-quadratic.
    * `localCheckpoint` after every iteration truncates lineage so planning
    * cost stays flat ([[Dedup.connectedComponents]]' discipline); the
    * edge list is checkpointed ONCE and reused by every iteration.
    * Iterations are a fixed count (power iteration on a bounded-diameter
    * dedup graph converges geometrically; callers needing a convergence
    * test can compare successive micro vectors — exact integers — at zero
    * FP ambiguity).
    *
    * Output: (idCol, rank_micro: bigint, rank: double = micro / 1e6).
    */
  def pageRank(pairs: DataFrame, iterations: Int,
      idColOut: String = "id"): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50], got $iterations")
    // checkpoint the pair frame once and symmetrize from the checkpoint —
    // `pairs ∪ pairs.swap` re-executes the pair generator's final stage
    // per union branch (the Dedup.connectedComponents fix)
    val p = pairs.select(col("id_a"), col("id_b")).localCheckpoint()
    val edges = p
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(p.select(col("id_b").as("src"), col("id_a").as("dst")))
    val outdeg = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("outdeg"))
    val n = outdeg.count()
    require(n > 0, "pageRank: empty pair graph")
    val baseMicro = math.floor(0.15 * 1e6 / n + 0.5).toLong
    val initMicro = math.floor(1e6 / n + 0.5).toLong
    // REGIME DISPATCH (the connectedComponents/driverComponents pattern):
    // each iteration below is a join + aggregate + join + localCheckpoint
    // — ~4 scheduling round-trips × `iterations` on a frame that is only
    // node-sized once the near-dup pair graph is a few thousand edges.
    // Under the bounded-collect cap the checkpointed edge list is pulled
    // once and the SAME integer micro-unit recurrence runs on the driver:
    // every term/contrib/rank' is Long or floor(double + 0.5) arithmetic
    // on values below 2^53 — accumulation-order-independent, so the
    // fixpoint is bit-identical (q186's DuckDB oracle unrolls the same
    // recurrence; GraphSpec asserts route equality). Graphs above the cap
    // — the 100 TB regime — run the distributed loop unchanged.
    val spark = pairs.sparkSession
    val driverCap = spark.conf.getOption("spark.graft.pagerank.driverEdgeRows")
      .map(_.toLong).getOrElse(4000000L)
    if (edges.schema("src").dataType ==
          org.apache.spark.sql.types.LongType &&
        edges.count() <= driverCap) {
      import spark.implicits._
      // packed primitive collect (Dedup.collectLongPairs): exactly 16
      // bytes per edge row on the driver heap — the cap arithmetic
      // (4 M rows = 64 MB) holds without boxing slack
      val chunks = Dedup.collectLongPairs(edges.select(col("src"), col("dst")))
      val nEdgeRows = chunks.map(_.length.toLong).sum / 2
      val idx = new java.util.HashMap[Long, Int](
        math.min(nEdgeRows * 2, 1 << 28).toInt max 16)
      val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
      chunks.foreach { c =>
        var p = 0
        while (p < c.length) {
          val s = c(p)
          if (!idx.containsKey(s)) { idx.put(s, ids.length); ids += s }
          p += 2
        }
      }
      val nn = ids.length
      val deg = new Array[Long](nn)
      chunks.foreach { c =>
        var p = 0
        while (p < c.length) { deg(idx.get(c(p))) += 1L; p += 2 }
      }
      var rank = Array.fill(nn)(initMicro)
      (1 to iterations).foreach { _ =>
        val term = new Array[Long](nn)
        var i = 0
        while (i < nn) {
          term(i) = math.floor(rank(i).toDouble / deg(i) + 0.5).toLong
          i += 1
        }
        val contrib = new Array[Long](nn)
        chunks.foreach { c =>
          var p = 0
          while (p < c.length) {
            val di = idx.getOrDefault(c(p + 1), -1)
            // a dst that is not a src cannot exist in a symmetrized edge
            // list, but the guard mirrors the iterative join's left-join
            // semantics for any future directed variant
            if (di >= 0) contrib(di) += term(idx.get(c(p)))
            p += 2
          }
        }
        val next = new Array[Long](nn)
        i = 0
        while (i < nn) {
          next(i) = baseMicro + math.floor(0.85 * contrib(i) + 0.5).toLong
          i += 1
        }
        rank = next
      }
      return ids.indices
        .map(j => (ids(j), rank(j), rank(j).toDouble / 1e6))
        .toDF(idColOut, "rank_micro", "rank")
    }
    var ranks = outdeg
      .select(col("id"), col("outdeg"), lit(initMicro).as("rank_micro"))
      .localCheckpoint()
    (1 to iterations).foreach { _ =>
      val terms = ranks.select(col("id").as("src"),
        floor(col("rank_micro").cast("double") / col("outdeg") + lit(0.5))
          .cast("long").as("term"))
      val contribs = edges.join(terms, Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("term")).as("contrib"))
      // every node has an incoming edge (symmetrized graph), but the left
      // join + coalesce keeps the recurrence total even if a caller feeds
      // a directed edge set through a future variant
      ranks = ranks.select(col("id"), col("outdeg"))
        .join(contribs, Seq("id"), "left")
        .select(col("id"), col("outdeg"),
          (lit(baseMicro) + floor(lit(0.85) * coalesce(col("contrib"), lit(0L))
            + lit(0.5)).cast("long")).as("rank_micro"))
        .localCheckpoint()
    }
    ranks.select(col("id").as(idColOut), col("rank_micro"),
      (col("rank_micro").cast("double") / lit(1e6)).as("rank"))
  }
}
