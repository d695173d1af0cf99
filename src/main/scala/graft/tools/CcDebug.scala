package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the sf10 CcBenefit signature mismatch: does the image
  * class graph converge within connectedComponents' default maxIter=20,
  * and if not, how many rounds does it need? Runs CC at maxIter 20 vs 60
  * over the full dHash class graph and prints the assignment diff.
  * Usage: CcDebug <sfDir>
  */
object CcDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.sources.Tables.load(spark, args(0), "documents")
    val sig = graft.ext.Multimodal.imageDHash(
        graft.ext.Multimodal.synthesizePngs(d.select(
          col("doc_id").as("media_id"),
          (lit(16) + pmod(expr("doc_id DIV 2"), lit(32))).cast("int").as("width"),
          (lit(16) + pmod(expr("doc_id DIV 2") * 7, lit(24))).cast("int").as("height"),
          (pmod(col("doc_id"), lit(2)) === 1).as("alpha"),
          expr("doc_id DIV 2").cast("long").as("seed"))))
      .filter(col("ok"))
      .select(col("media_id").as("id"), col("dhash").as("sig"))
      .localCheckpoint()
    val classes = sig.groupBy(col("sig")).agg(min(col("id")).as("cid"))
      .localCheckpoint()
    println(s"docs=${sig.count()} classes=${classes.count()}")
    val pairs = graft.ext.Dedup.hammingPairs64(
      classes.select(col("cid").as("id"), col("sig"))).localCheckpoint()
    println(s"class pairs=${pairs.count()}")
    val nodes = classes.select(col("cid").as("id"))
    // inline copy of the connectedComponents loop with per-round stats
    val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    val touched = sym.select(col("src").as("id")).distinct()
      .join(nodes, Seq("id"), "left_semi").localCheckpoint()
    println(s"touched=${touched.count()} symEdges=${sym.count()}")
    var labels = touched.select(col("id"), col("id").as("rep"))
    var iter = 0
    var changed = -1L
    while (changed != 0 && iter < 60) {
      val neighborReps = sym
        .join(labels.withColumnsRenamed(Map("id" -> "dst", "rep" -> "nrep")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("nrep")).as("minNeighborRep"))
      val repOfRep = labels.select(col("id").as("rep"), col("rep").as("repOfRep"))
      val cand = labels.join(neighborReps, Seq("id"), "left")
        .join(repOfRep, Seq("rep"), "left")
        .select(col("id"), col("rep"),
          least(col("rep"),
            coalesce(col("repOfRep"), col("rep")),
            coalesce(col("minNeighborRep"), col("rep"))).as("cand"))
      val hubMin = cand.groupBy(col("rep").as("hub"))
        .agg(min(col("cand")).as("hubMin"))
      val updated = cand
        .join(hubMin.withColumnsRenamed(Map("hub" -> "rep")), Seq("rep"), "left")
        .join(hubMin.withColumnsRenamed(
          Map("hub" -> "id", "hubMin" -> "selfHubMin")), Seq("id"), "left")
        .select(col("id"),
          least(col("cand"),
            coalesce(col("hubMin"), col("cand")),
            coalesce(col("selfHubMin"), col("cand"))).as("rep"),
          col("rep").as("prevRep"))
        .localCheckpoint()
      changed = updated.filter(col("rep") =!= col("prevRep")).count()
      val rows = updated.count()
      labels = updated.select(col("id"), col("rep"))
      iter += 1
      println(s"round $iter: changed=$changed rows=$rows")
    }
    spark.stop()
  }
}
