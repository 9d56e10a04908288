package graft.vector

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Deterministic spherical k-means ([[Similarity.kmeansCentroids]] /
  * [[Similarity.withKmeansLabel]]) — the learned-cell IVF index build.
  * Pins the determinism contract (fixed seeds + decimal means + total-
  * order argmax ⇒ identical fit run to run), the assignment edge cases
  * the oracle must agree on, and that one Lloyd round does not worsen
  * the clustering it starts from.
  */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  // Two tight clusters around orthogonal axes + a straggler: seeds (the
  // 2 smallest by md5-hash-of-id — ids 4 then 1 on this fixture) land
  // one in each cluster, so one Lloyd round should keep the split and
  // move centroids to the cluster means.
  private def corpus = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.0f, 1.0f, 0.1f)),
    (2L, Seq(0.9f, 0.1f, 0.0f)),
    (3L, Seq(0.1f, 1.0f, 0.0f)),
    (4L, Seq(0.8f, 0.0f, 0.2f)),
    (5L, Seq(0.0f, 0.9f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("fit is deterministic: same data, same centroids, twice") {
    val a = Similarity.kmeansCentroids(corpus, "vec_id", "embedding", k = 2, iters = 2)
    val b = Similarity.kmeansCentroids(corpus.repartition(5), "vec_id", "embedding", k = 2, iters = 2)
    assert(a == b, "fit must be independent of partitioning and rerun")
  }

  test("one Lloyd round on separable clusters recovers the split") {
    val labels = Similarity.withKmeansLabel(corpus, "vec_id", "embedding", k = 2, iters = 1)
      .select(col("vec_id"), col("centroid_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // x-axis cluster {0,2,4} together, y-axis cluster {1,3,5} together
    assert(Set(labels(0L), labels(2L), labels(4L)).size == 1)
    assert(Set(labels(1L), labels(3L), labels(5L)).size == 1)
    assert(labels(0L) != labels(1L))
  }

  test("zero-norm vectors assign to the smallest centroid id (cosine null -> -2 floor)") {
    // Id 10 hashes above both seed hashes, so the seeds stay ids 4 and 1.
    val withZero = corpus.union(Seq((10L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val labels = Similarity.withKmeansLabel(withZero, "vec_id", "embedding", k = 2, iters = 0)
      .where(col("vec_id") === 10L).select(col("centroid_id"))
      .collect().map(_.getLong(0))
    // iters=0: centroids are the raw seeds (ids 1 and 4 under the
    // hash-spread pick); ties at -2 go to the smallest centroid id.
    assert(labels.toSeq == Seq(1L))
  }

  test("a cell that loses all members drops out instead of resurrecting") {
    // The hash-spread seeds on {0..3} are ids 1 and 2; their vectors are
    // duplicates, so every row ties to both cells, ties go to cell 1, and
    // after one recompute only cell 1 survives.
    val dup = Seq(
      (0L, Seq(0.9f, 0.1f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.8f, 0.1f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(dup, "vec_id", "embedding", k = 2, iters = 1)
    assert(cents.map(_._1) == Seq(1L), s"expected only cell 1, got ${cents.map(_._1)}")
  }

  test("withKmeansLabel labels every row and the label set is the centroid set") {
    val labeled = Similarity.withKmeansLabel(corpus, "vec_id", "embedding", k = 2, iters = 1)
    assert(labeled.where(col("centroid_id").isNull).count() == 0)
    val cents = Similarity.kmeansCentroids(corpus, "vec_id", "embedding", k = 2, iters = 1)
    val used = labeled.select("centroid_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(used.subsetOf(cents.map(_._1).toSet))
  }

  test("one Lloyd round does not worsen mean within-cell cosine") {
    def meanSim(iters: Int): Double = {
      val cents = Similarity.kmeansCentroids(corpus, "vec_id", "embedding", k = 2, iters = iters)
      val labeled = Similarity.withKmeansLabel(corpus, "vec_id", "embedding", k = 2, iters = iters)
      val centDf = cents.toDF("centroid_id", "cvec")
      labeled.join(centDf, "centroid_id")
        .select(Similarity.cosine(col("embedding"), col("cvec")).as("s"))
        .agg(avg("s")).collect().head.getDouble(0)
    }
    assert(meanSim(1) >= meanSim(0) - 1e-12)
  }
}
