package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level evidence for round-17 verdict #7: would the tW scan
  * widening help the events/lineitem FACT-table gates the way it helped
  * the kernel-heavy doc gates? For each fact table this reports
  *   (a) the planned scan partition count vs the session cores — whether
  *       the widening condition (`parts * 2 <= cores`) would even fire;
  *   (b) a paired A/B of the gate-shaped aggregation over the raw scan
  *       vs the same aggregation over `repartition(cores)` right after
  *       the read — the decode-bound ≈ net-zero claim, priced directly.
  * The aggregations mirror q1_agg (lineitem: filter + group + 4 sums)
  * and events_tumbling (events: window + group + sum) closely enough to
  * be scan+decode-representative without running the full gates.
  *
  * Run: `sbt 'Test/runMain graft.ScanWidthProbe <sfDir> [reps]'`.
  */
object ScanWidthProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cores = spark.sparkContext.defaultParallelism

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(f: => Unit): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }

    def liAgg(li: DataFrame): DataFrame = li
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(QueriesShared.Dec152)).as("sum_qty"),
        sum(col("l_extendedprice").cast(QueriesShared.Dec152)).as("sum_base"),
        count(lit(1)).as("n"))
    def evAgg(ev: DataFrame): DataFrame = ev
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6))).as("sv"))

    val rows = Seq(
      ("lineitem", () => graft.io.Tables.table(spark, dir, "lineitem"),
        (df: DataFrame) => liAgg(df)),
      ("events", () => graft.io.Tables.events(spark, dir),
        (df: DataFrame) => evAgg(df))
    ).map { case (name, read, agg) =>
      val parts = read().rdd.getNumPartitions
      val fires = parts * 2 <= cores
      noop(agg(read())) // warm-up (footers, codegen)
      val raw = med(noop(agg(read())))
      val widened = med(noop(agg(read().repartition(cores))))
      f""""$name":{"scan_parts":$parts,"cores":$cores,"widen_fires":$fires,""" +
        f""""raw_sec":$raw%.3f,"widened_sec":$widened%.3f}"""
    }
    println(rows.mkString(s"""{"probe":"scan_width","sf":"$dir",""", ",", "}"))
    spark.stop()
  }
}
