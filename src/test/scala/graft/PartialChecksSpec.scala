package graft

/** Enforces [[SparkEntry.partialExpectations]] — the deterministic
  * row-count + schema pins for the queries that have no SQL-expressible
  * DuckDB oracle (approximate dedup/ANN ops and the recall harness rows).
  * These operators are deterministic by construction, so at a fixed scale
  * factor both dimensions are exact constants; a drift here means the
  * operator's behavior changed, not noise. Value-level quality is covered
  * by the oracle-checked companion queries (q92-q101, q112, q119).
  */
class PartialChecksSpec extends SparkTestBase {
  private val sfDir = "/root/testdata/sf0.01"
  private val sfName = "sf0.01"

  for ((name, (expRows, expSchema)) <- SparkEntry.partialExpectations(sfName).toSeq.sortBy(_._1)) {
    test(s"$name: pinned rows=$expRows and schema hold at $sfName") {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val schema = df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
      assert(schema == expSchema, s"schema drift for $name")
      val rows = df.count()
      assert(rows == expRows, s"row-count drift for $name: got $rows, pinned $expRows")
    }
  }

  test("every no-oracle query is pinned (no_oracle only on the hash dimension)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val pinned = SparkEntry.partialExpectations(sfName).keySet
    assert(noOracle == pinned,
      s"unpinned no-oracle queries: ${(noOracle -- pinned).toSeq.sorted.mkString(", ")}; " +
        s"stale pins: ${(pinned -- noOracle).toSeq.sorted.mkString(", ")}")
  }
}
