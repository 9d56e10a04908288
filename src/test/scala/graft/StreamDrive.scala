package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual end-to-end drive of the streaming surface against real testdata
  * (run with `sbt 'Test/runMain graft.StreamDrive'`); prints comparison
  * against the equivalent batch computation.
  */
object StreamDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
    val src = java.nio.file.Files.createTempDirectory("sdrive").toString
    ev.write.parquet(src + "/b0")
    val stream = spark.readStream.schema(ev.schema).parquet(src + "/*")

    val q1 = streaming.EventStreams.dedupStream(stream)
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    q1.processAllAvailable(); q1.stop()
    println(s"DEDUP_ROWS=${spark.table("dd").count()} SRC=${ev.count()}")

    val q2 = streaming.EventStreams.clickPurchaseJoin(stream)
      .writeStream.format("memory").queryName("cp").outputMode("append").start()
    q2.processAllAvailable(); q2.stop()
    val streamed = spark.table("cp").count()
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val purch = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("event_id").as("purchase_id"))
    val batch = clicks.join(purch,
      col("user_id") === col("pu") && col("pts") <= col("click_ts") &&
        col("pts") >= col("click_ts") - expr("INTERVAL 1 HOUR")).count()
    println(s"JOIN_STREAM=$streamed JOIN_BATCH=$batch MATCH=${streamed == batch}")
    spark.stop()
  }
}
