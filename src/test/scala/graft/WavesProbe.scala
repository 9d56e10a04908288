package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc drive of the multi-wave streaming gates: asserts each _waves
  * result is row-identical to its _live twin (the re-batching contract)
  * and prints the micro-batch count actually executed.
  */
object WavesProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    for (pair <- Seq(
        ("streaming_sessionize_live", "streaming_sessionize_waves"),
        ("streaming_merge_live", "streaming_merge_waves"))) {
      val (live, waves) = pair
      val a = Queries.queries(live)(spark, sf).collect().map(_.toSeq).toSet
      val b = Queries.queries(waves)(spark, sf).collect().map(_.toSeq).toSet
      println(s"WAVES $live=${a.size} $waves=${b.size} identical=${a == b}")
      if (a != b) {
        (a -- b).take(3).foreach(r => println(s"WAVES only-live:  $r"))
        (b -- a).take(3).foreach(r => println(s"WAVES only-waves: $r"))
      }
    }
    spark.stop()
  }
}
