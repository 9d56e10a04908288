package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage-level timing probe for the bench outliers (not a test —
  * run with `sbt 'Test/runMain graft.tools.PerfProbe'`). Times each
  * sub-stage of the composed flows so optimization targets measured cost,
  * not guessed cost.
  */
object PerfProbe {
  def time(name: String)(f: => DataFrame): Unit = {
    val df = f
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val t1 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val t2 = System.nanoTime()
    println(f"[probe] $name%-40s first ${(t1 - t0) / 1e9}%.2f s  warm ${(t2 - t1) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.{Dedup, TextAnalysis}

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.write.format("noop").mode("overwrite").save() // warm

    time("scan only")(docs.select(col("doc_id")))
    time("scored (langid+quality)")(docs.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang_guess"),
      round(TextAnalysis.qualityScore(col("text")), 6).as("quality")))
    val scored = docs.select(col("doc_id"), col("text"),
      TextAnalysis.langId(col("text")).as("lang_guess"),
      round(TextAnalysis.qualityScore(col("text")), 6).as("quality"))
    val kept = scored.where(col("lang_guess") === "en" && col("quality") >= 0.45)
    time("kept")(kept)
    import org.apache.spark.sql.expressions.Window
    val keeperW = Window.partitionBy(col("fp"))
    val afterExact = kept
      .withColumn("fp", TextAnalysis.exactFingerprint(col("text")))
      .withColumn("keeper", min(col("doc_id")).over(keeperW))
      .where(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("text"), col("lang_guess"), col("quality"))
    time("afterExact (window keeper)")(afterExact)
    time("afterExact x2 (no cache)")(afterExact.union(afterExact))
    val cached = afterExact.persist()
    time("afterExact persist+count")(cached)
    time("jaccard pairs over cached")(
      Dedup.ngramJaccardPairs(cached.select(col("doc_id"), col("text")),
        "doc_id", "text", n = 3, threshold = 0.5, maxDocFreq = 100L))
    cached.unpersist()

    time("full corpus_clean")(graft.text.CorpusPipeline.clean(
      docs, "doc_id", "text", lang = "en", minQuality = 0.45,
      jaccardThreshold = 0.5, maxDocFreq = 100L))

    // profile_orders breakdown
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val proj = orders.select(col("o_custkey"),
      col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(15, 2)).as("o_price"),
      col("o_orderstatus"))
    time("orders scan")(proj)
    time("profile_orders")(graft.ops.Profile.columnProfile(proj,
      Seq("o_custkey", "o_price", "o_orderstatus")))
    graft.ops.Profile.columnProfile(proj, Seq("o_custkey", "o_price", "o_orderstatus"))
      .explain("formatted")
    spark.stop()
  }
}
