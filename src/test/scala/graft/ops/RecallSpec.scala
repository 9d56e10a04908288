package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RecallSpec extends SparkSpec {
  import spark.implicits._

  // exact top-2 per query: q1 -> {10, 11}, q2 -> {20, 21}
  private val exactTopK = Seq(
    (1L, 1L, 10L), (1L, 2L, 11L),
    (2L, 1L, 20L), (2L, 2L, 21L)).toDF("query_id", "rank", "neighbor_id")

  test("topKRecall: full overlap is 1.0 and meets any floor") {
    val r = Recall.topKRecall(exactTopK, exactTopK, k = 2, floor = 0.9).collect().head
    assert(r.getAs[Long]("n_queries") == 2L)
    assert(r.getAs[Double]("mean_recall") == 1.0)
    assert(r.getAs[Double]("min_recall") == 1.0)
    assert(r.getAs[Boolean]("meets_floor"))
  }

  test("topKRecall: a query missing from approx counts zero hits") {
    val approx = Seq((1L, 1L, 10L), (1L, 2L, 99L)).toDF("query_id", "rank", "neighbor_id")
    val r = Recall.topKRecall(approx, exactTopK, k = 2, floor = 0.5).collect().head
    // q1: 1/2 hit, q2: 0/2 -> mean 1/4, min 0
    assert(r.getAs[Long]("n_queries") == 2L)
    assert(r.getAs[Double]("mean_recall") == 0.25)
    assert(r.getAs[Double]("min_recall") == 0.0)
    assert(!r.getAs[Boolean]("meets_floor"))
  }

  test("pairRecall: subset recall is hits/exact; non-subset pairs inflate n_approx only") {
    val exact = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val approx = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val r = Recall.pairRecall(approx, exact, floor = 0.6).collect().head
    assert(r.getAs[Long]("n_exact") == 4L)
    assert(r.getAs[Long]("n_approx") == 3L)
    assert(r.getAs[Double]("recall") == 0.5) // 2 of 4 exact pairs found
    assert(!r.getAs[Boolean]("meets_floor"))
  }

  test("planted near-dup twins are recovered by autoNbits LSH (the production audit)") {
    // The recall_embedding_lsh_auto gate's scenario at miniature scale:
    // deterministic unit-ish vectors, each unioned with a +-0.01
    // perturbed twin; count-derived nbits (min clamp 8 here) must
    // recover the planted pairs at threshold 0.99.
    import graft.vector.Similarity
    import org.apache.spark.sql.functions._
    val n = 200
    val base = spark.range(0, n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), p =>
        sin(col("id") * lit(0.7d) + p.cast("double") * lit(0.31d))).as("embedding"))
    val planted = base.select((col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        x + lit(0.01d) * when(pmod(i, lit(2)) === 0, lit(1.0d))
          .otherwise(lit(-1.0d))).as("embedding"))
    val all = base.unionByName(planted)
    val nbits = Similarity.autoNbits(all.count(), maxBits = 16)
    assert(nbits == 8) // 400 vectors -> floor clamp
    val r = Recall.pairRecall(
      Similarity.lshNearDupPairs(all, "vec_id", "embedding", dim = 64,
        threshold = 0.99, nbits = nbits, seeds = Seq(42L, 43L, 44L)),
      Similarity.nearDupPairs(all, "vec_id", "embedding", 0.99),
      floor = 0.9).collect().head
    assert(r.getAs[Long]("n_exact") >= n.toLong, "planted pairs missing from exact tier")
    assert(r.getAs[Boolean]("meets_floor"),
      s"autoNbits LSH lost planted near-dups: $r")
  }
}
