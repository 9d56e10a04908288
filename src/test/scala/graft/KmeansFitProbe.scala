package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fit-cost split for the k-means index build (`sim_ivf_kmeans`): the
  * oracle-exact DECIMAL centroid recompute vs the production vecMean
  * double path, same scales back-to-back in one JVM.
  * `sbt 'Test/runMain graft.KmeansFitProbe [dirs...]'`
  */
object KmeansFitProbe {
  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_sf1", "/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    for (dir <- scales; rep <- 1 to 2) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val (ce, tExact) = timed {
        graft.vector.Similarity.kmeansCentroids(emb, "vec_id", "embedding",
          k = 10, iters = 1, exact = true)
      }
      val (cf, tFast) = timed {
        graft.vector.Similarity.kmeansCentroids(emb, "vec_id", "embedding",
          k = 10, iters = 1, exact = false)
      }
      val maxDelta = ce.toMap.map { case (cid, v) =>
        cf.toMap.get(cid).map(w => v.zip(w).map { case (a, b) => math.abs(a - b) }.max)
          .getOrElse(Double.NaN)
      }.max
      println(f"KMFIT dir=$dir rep=$rep exact=$tExact%.2f fast=$tFast%.2f maxAbsDelta=$maxDelta%.2e")
    }
    spark.stop()
  }
}
