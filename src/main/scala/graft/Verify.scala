package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, rest @ _*) = args
    val only = rest.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // Session.local carries the cross-engine contract (UTC, TIMESTAMP_MICROS
    // dump so arrow/DuckDB read the same microsecond timestamps, nanosAsLong).
    val spark = Session.local(cpus, appName = "graft-verify")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Partial checks for no-oracle queries: the driver can only hash-compare
    // where an oracle SQL exists, so for the approximate ops we assert the
    // two dimensions that ARE deterministic — row count and schema — against
    // the pins in SparkEntry.partialExpectations, and emit the result as
    // partial_checks.json next to the dump.
    // replica dirs are named graft_sf1 / graft_sf10 — same pin keys as a
    // bare sf1 / sf10 basename
    val pins = SparkEntry.partialExpectations
      .getOrElse(new java.io.File(sfDir).getName.stripPrefix("graft_"), Map.empty)
    val partial = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        if (!SparkEntry.oracleSql.contains(name)) {
          val back = spark.read.parquet(s"$outDir/$name")
          val rows = back.count()
          val schema = back.schema
            .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
          partial(name) = pins.get(name) match {
            case Some((expRows, expSchema)) =>
              val rm = rows == expRows
              val sm = schema == expSchema
              if (!rm || !sm) System.err.println(
                s"[verify] PARTIAL-FAIL $name: rows $rows vs $expRows, schema $schema vs $expSchema")
              s"""{"rows_match": $rm, "schema_match": $sm, "hash_match": null, """ +
                s""""spark_rows": $rows, "expected_rows": $expRows, "err": null}"""
            case None =>
              s"""{"rows_match": null, "schema_match": null, "hash_match": null, """ +
                s""""spark_rows": $rows, "expected_rows": null, "err": "unpinned", """ +
                s""""schema": "$schema"}"""
          }
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (partial.nonEmpty)
      Files.writeString(Paths.get(s"$outDir/partial_checks.json"),
        partial.map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
