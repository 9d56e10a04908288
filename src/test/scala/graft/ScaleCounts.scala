package graft

import org.apache.spark.sql.SparkSession

/** Output-cardinality probe for the dedup family at two SFs: attributes
  * super-linear wall growth on replicated corpora to TRUE result growth
  * (every doc gains factor-1 exact duplicates) vs an engine cliff.
  */
object ScaleCounts {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.1", "/tmp/graft_sf1");
         q <- Seq("dedup_embedding", "dedup_embedding_lsh", "dedup_simhash",
                  "dedup_ngram_jaccard", "dedup_minhash_lsh")) {
      val n = Queries.queries(q)(spark, sf).count()
      println(s"COUNTS $sf $q rows=$n")
    }
    spark.stop()
  }
}
