package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Physical-plan audit over the whole SparkEntry catalog: for each query,
  * report scan pushdown (PushedFilters / ReadSchema width), join strategies,
  * shuffle counts and whole-stage-codegen spans — the facts that decide
  * whether a plan survives a 100× scale-up. AQE is disabled here so the
  * static plan is concrete. Run: PlanAudit <sfDir> [query...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.executedPlan
          def nodes(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(nodes)
          val all = nodes(plan)
          val scans = all.collect { case s: FileSourceScanExec =>
            val table = s.relation.location.rootPaths.headOption
              .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
            val pushed = s.metadata.getOrElse("PushedFilters", "[]")
            val nCols = s.requiredSchema.length
            val p = if (pushed == "[]") "no-filter" else s"pushed=${pushed.take(70)}"
            s"$table(cols=$nCols, $p)"
          }
          val joins = Seq(
            "BHJ" -> all.count(_.isInstanceOf[BroadcastHashJoinExec]),
            "SMJ" -> all.count(_.isInstanceOf[SortMergeJoinExec]),
            "SHJ" -> all.count(_.isInstanceOf[ShuffledHashJoinExec]),
            "BNLJ" -> all.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
            "CARTESIAN" -> all.count(_.isInstanceOf[CartesianProductExec]))
            .filter(_._2 > 0).map { case (k, v) => s"$k=$v" }
          val shuffles = all.count(_.isInstanceOf[ShuffleExchangeExec])
          val wsc = all.count(_.isInstanceOf[WholeStageCodegenExec])
          // rank-filter windows should be served by WindowGroupLimitExec
          // (partial per-partition top-k BEFORE the shuffle) — if a ranked
          // top-k query has windows but no group-limit, the filter shape
          // defeated InferWindowGroupLimit and whole partitions get sorted
          val windows = all.count(_.getClass.getSimpleName == "WindowExec")
          val groupLimits = all.count(_.getClass.getSimpleName == "WindowGroupLimitExec")
          // partial (map-side) vs final aggregate instances: a groupBy that
          // shows NO partial stage ships every input row to the shuffle —
          // for bounded-buffer aggregates (TopKAgg) the partial stage is
          // exactly what caps the shuffle at k rows/group/partition
          import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
          import org.apache.spark.sql.catalyst.expressions.aggregate.{Partial, Final}
          val partialAggs = all.count {
            case a: BaseAggregateExec => a.aggregateExpressions.exists(_.mode == Partial)
            case _ => false
          }
          val finalAggs = all.count {
            case a: BaseAggregateExec => a.aggregateExpressions.exists(_.mode == Final)
            case _ => false
          }
          println(s"== $name")
          scans.distinct.foreach(s => println(s"   scan: $s"))
          val winInfo = if (windows + groupLimits > 0) s"  windows=$windows groupLimits=$groupLimits" else ""
          val aggInfo = if (partialAggs + finalAggs > 0) s"  aggs=partial:$partialAggs/final:$finalAggs" else ""
          println(s"   joins: ${joins.mkString(" ")}  shuffles=$shuffles  codegenSpans=$wsc  scanNodes=${scans.length}$winInfo$aggInfo")
        } catch {
          case e: Throwable => println(s"== $name FAILED: ${e.getMessage.take(100)}")
        }
      }
    spark.stop()
  }
}
