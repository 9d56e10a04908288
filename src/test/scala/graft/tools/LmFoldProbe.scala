package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stage-split probe for the `text_lm_surprisal` sf10 outlier (run with
  * `sbt 'Test/runMain graft.tools.LmFoldProbe'`, SPARK_GRAFT_SF_DIR to
  * point at a scale dir): times the tf build, the term-count join, and
  * BOTH per-doc reduction forms — the deterministic sorted fold
  * (collect_list + array_sort + interpreted `aggregate` HOF) and a
  * plain `sum(lp)` — to attribute how much of the gate's wall is the
  * determinism contract vs the unavoidable full-vocabulary shuffle.
  */
object LmFoldProbe {
  def time(name: String)(f: => DataFrame): Unit = {
    val df = f
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val t1 = System.nanoTime()
    println(f"[probe] $name%-34s ${(t1 - t0) / 1e9}%.2f s")
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
    val docs = spark.read.parquet(dir + "/documents.parquet")

    val toks = docs.select(col("doc_id"),
      graft.text.TextAnalysis.tokens(col("text")).as("toks"))
    val tf0 = toks.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    time("tf build (explode + groupBy)")(tf0)
    val tf = tf0.persist()
    tf.count()

    val counts = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
    val vt = counts.agg(count(lit(1)).as("v"),
      coalesce(sum(col("cnt")), lit(0L)).as("total"))
    val lnP = log((col("cnt").cast(DoubleType) + lit(1.0)) /
      (col("total").cast(DoubleType) + col("v").cast(DoubleType)))
    val contrib0 = tf.join(counts, "term").crossJoin(broadcast(vt))
      .withColumn("lp", col("tf").cast(DoubleType) * lnP)
    time("contrib (counts join, from cache)")(contrib0)
    val contrib = contrib0.persist()
    contrib.count()

    time("per-doc PLAIN sum (from cache)")(
      contrib.groupBy(col("doc_id"))
        .agg(sum(col("lp")).as("s"), sum(col("tf")).as("n")))
    time("per-doc SORTED FOLD (from cache)")(
      contrib.groupBy(col("doc_id"))
        .agg(aggregate(
          array_sort(collect_list(struct(col("term"), col("lp")))),
          lit(0.0d),
          (acc, x) => acc + x.getField("lp")).as("s"),
          sum(col("tf")).as("n")))
    time("full operator end-to-end")(
      graft.text.LanguageModel.unigramSurprisal(docs, "doc_id", "text"))
    spark.stop()
  }
}
