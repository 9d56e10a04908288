package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-dataset generator
  * (`sbt 'Test/runMain graft.ScaleData [src out factor [mode]]'`):
  * replicates the fact tables of an sf directory `factor`x with
  * primary-key offsets — orders/lineitem share the orderkey offset so
  * their join keys stay consistent — while dimension tables are copied
  * unchanged (real datasets grow facts, not dims).
  *
  * Corpus density modes for documents/embeddings:
  *
  *  - `replica` (default): replicated rows keep their text/vector
  *    payloads, so every original row gains `factor - 1` exact
  *    duplicates. Duplicate-SATURATED: each near-dup cluster is
  *    `factor`x denser, so pair-OUTPUT operators' true result grows
  *    ~quadratically in the factor — a stress fixture for the dedup
  *    families, NOT a density-faithful scale point (the sf10 replica
  *    headline is dominated by its own output size; SCALE.md).
  *  - `realistic`: documents/embeddings are REGENERATED at
  *    `src rows x factor` via [[RealisticCorpus]]'s planted ~1%
  *    exact + ~1% near duplicate pairs — the density a real crawl
  *    shows after upstream URL dedup, under which the true pair set
  *    grows LINEARLY with corpus size. Schema matches the fixture
  *    (lang/source/n_chars, label) so the dir stays a drop-in
  *    SPARK_GRAFT_SF_DIR; text/vector content is synthetic, so
  *    content-sensitive gates measure a different corpus — use this
  *    mode for the dedup/ANN/recall families' scale rows.
  *
  * The output directory serves as a drop-in SPARK_GRAFT_SF_DIR for Bench:
  * sf0.1 x 10 ~ sf1 for every per-row and per-group cost. The events
  * table round-trips in whatever encoding the source directory carries
  * (BIGINT nanos under `nanosAsLong` for legacy data, TIMESTAMP_NTZ for
  * current); [[graft.io.Tables.normalizeEventTs]] handles every observed
  * encoding, so readers are unaffected either way.
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val mode = args.lift(3).getOrElse("replica")
    require(mode == "replica" || mode == "realistic", s"unknown mode $mode")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(df: DataFrame, keyCols: Seq[String], offset: Long): DataFrame =
      (0 until factor).map { i =>
        keyCols.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * offset)))
      }.reduce(_ unionByName _)

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"SCALEDATA $name rows=${spark.read.parquet(s"$out/$name.parquet").count()}")
    }

    val t = (n: String) => spark.read.parquet(s"$src/$n.parquet")
    for (dim <- Seq("region", "nation", "customer", "supplier", "part"))
      write(t(dim), dim)
    // orders/lineitem share the orderkey offset so l_orderkey still
    // resolves to its replica's order.
    write(replicate(t("orders"), Seq("o_orderkey"), 100000000L), "orders")
    write(replicate(t("lineitem"), Seq("l_orderkey"), 100000000L), "lineitem")
    write(replicate(t("events"), Seq("event_id"), 100000000L), "events")
    if (mode == "realistic") {
      import spark.implicits._
      val nDocs = t("documents").count() * factor
      val nVecs = t("embeddings").count() * factor
      write(spark.range(nDocs).repartition(64)
        .map(i => (i, RealisticCorpus.docText(i)))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en"))
        .withColumn("source", lit("realistic"))
        .withColumn("n_chars", length(col("text")).cast("long")), "documents")
      write(spark.range(nVecs).repartition(64)
        .map(i => (i, RealisticCorpus.vec(i)))
        .toDF("vec_id", "embedding")
        .withColumn("label", pmod(col("vec_id"), lit(10)).cast("int")), "embeddings")
    } else {
      write(replicate(t("documents"), Seq("doc_id"), 100000000L), "documents")
      write(replicate(t("embeddings"), Seq("vec_id"), 100000000L), "embeddings")
    }
    spark.stop()
  }
}
