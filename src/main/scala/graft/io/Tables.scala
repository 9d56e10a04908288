package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided Parquet test tables (TESTDATA.md) and
  * generic declared-schema sources.
  *
  * Design (SURVEY.md §2.1): every production read declares its schema —
  * Parquet carries one natively; JSON/CSV readers require an explicit
  * [[org.apache.spark.sql.types.StructType]] (never `inferSchema`, which
  * costs an extra full scan and is non-deterministic at 100 TB).
  */
object Tables {

  /** Read one of the TPC-H-ish test tables from an sf directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** The events table ships with TIMESTAMP(NANOS) parquet timestamps,
    * which Spark has no native type for. Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong`; here the long nanos column is
    * converted to a micros TimestampType (integral DIV — double division
    * would lose precision above 2^53 ns). Driver data is micro-aligned, so
    * the conversion is lossless.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Self-sufficient on sessions built without the legacy conf (it is
    // runtime-mutable): without it the read below throws
    // PARQUET_TYPE_ILLEGAL before any conversion could run.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Streaming twin of [[events]]: file-stream source with a DECLARED
    * schema (stream sources cannot infer) taken from the parquet footer,
    * plus the same nanos->micros conversion.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = table(spark, dir, "events").schema // footer-only read
    // The file source requires a directory. When the events table IS a
    // directory (standard multi-part write layout) stream it directly; a
    // glob filter on the leaf name would match nothing and yield a
    // silently empty stream. A single-file table streams from the parent
    // dir with the glob restricting the listing.
    val eventsPath = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = eventsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df =
      if (fs.getFileStatus(eventsPath).isDirectory)
        spark.readStream.schema(schema).parquet(eventsPath.toString)
      else spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case _ => df
    }
  }
}
