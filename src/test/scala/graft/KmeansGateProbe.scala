package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage split for `sim_ivf_kmeans` at scale: fit, assignment
  * materialization, the ivfTopK centroid recompute, and the full gate.
  */
object KmeansGateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"KMGATE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    for (rep <- 1 to 2) {
      println(s"KMGATE --- rep $rep $dir")
      val cents = timed("fit")(graft.vector.Similarity.kmeansCentroids(
        emb, "vec_id", "embedding", k = 10, iters = 1))
      val labeled = graft.vector.Similarity.withKmeansLabel(
        emb, "vec_id", "embedding", k = 10, iters = 1)
      timed("assign.count")(labeled.groupBy(col("centroid_id")).count().collect()
        .foreach(r => println(s"KMGATE   cell ${r.getLong(0)} -> ${r.getLong(1)}")))
      timed("ivf.centroids")(graft.vector.Similarity.centroids(
        labeled, "centroid_id", "embedding").collect())
      timed("ivf.on.labeled")(graft.vector.Similarity.ivfTopK(
          labeled.where(col("vec_id") < 8), labeled, "vec_id", "embedding",
          "centroid_id", k = 5, nprobe = 3)
        .write.format("noop").mode("overwrite").save())
      val persisted = labeled.persist()
      persisted.count()
      timed("ivf.on.persisted")(graft.vector.Similarity.ivfTopK(
          persisted.where(col("vec_id") < 8), persisted, "vec_id", "embedding",
          "centroid_id", k = 5, nprobe = 3)
        .write.format("noop").mode("overwrite").save())
      persisted.unpersist()
      val plain = emb.withColumn("centroid_id", pmod(col("vec_id"), lit(10)))
      timed("ivf.on.plainlabel")(graft.vector.Similarity.ivfTopK(
          plain.where(col("vec_id") < 8), plain, "vec_id", "embedding",
          "centroid_id", k = 5, nprobe = 3)
        .write.format("noop").mode("overwrite").save())
      timed("full.gate")(Queries.queries("sim_ivf_kmeans")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
