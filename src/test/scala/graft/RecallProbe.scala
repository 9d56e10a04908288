package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc driver for the recall_* audit gates: prints the one-row recall
  * report per SF so floor constants in Queries can be calibrated against
  * measured values (not guessed).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfs = if (args.nonEmpty) args.toSeq
              else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (sf <- sfs; q <- Seq("recall_ivf_topk", "recall_quantized_rescore",
                             "recall_embedding_lsh", "recall_minhash_lsh")) {
      val r = Queries.queries(q)(spark, sf).collect().head
      println(s"PROBE $sf $q -> $r")
    }
    spark.stop()
  }
}
