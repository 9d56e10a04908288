package graft.vector

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),
    (2L, Array(0.0f, 1.0f, 0.0f), 1),
    (3L, Array(0.0f, 0.95f, 0.05f), 1),
    (4L, Array(0.0f, 0.0f, 1.0f), 2)).toDF("vec_id", "embedding", "label")

  test("cosine: identical=1, orthogonal=0, zero-norm=null") {
    val df = Seq(
      (Array(1.0, 2.0), Array(1.0, 2.0)),
      (Array(1.0, 0.0), Array(0.0, 1.0)),
      (Array(0.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    val got = df.collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    assert(math.abs(got(0).get - 1.0) < 1e-12)
    assert(math.abs(got(1).get) < 1e-12)
    assert(got(2).isEmpty)
  }

  test("brute-force top-k: nearest neighbor is the geometric one, self excluded") {
    val got = Similarity.bruteForceTopK(vecs.where(col("vec_id") === 0L), vecs,
        "vec_id", "embedding", 2)
      .orderBy(col("rank")).collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L).take(2).toSeq
      || got.head.getAs[Long]("neighbor_id") == 1L)
    assert(!got.map(_.getAs[Long]("neighbor_id")).contains(0L))
  }

  test("IVF top-k with nprobe=all matches brute force on this small set") {
    val brute = Similarity.bruteForceTopK(vecs.where(col("vec_id") < 2), vecs,
        "vec_id", "embedding", 2)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(vecs.where(col("vec_id") < 2), vecs,
        "vec_id", "embedding", "label", k = 2, nprobe = 3)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf == brute)
  }

  test("centroids: per-label mean, assembled in position order") {
    val cents = Similarity.centroids(vecs, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(cents(2).toSeq == Seq(0.0, 0.0, 1.0))
    assert(math.abs(cents(0).head - 0.95) < 1e-6)
  }

  test("bruteForceTopKAgg (heap aggregate) == window-based bruteForceTopK") {
    val win = Similarity.bruteForceTopK(vecs.where(col("vec_id") < 3), vecs,
        "vec_id", "embedding", 3)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"), col("sim"))
      .collect().map(_.toSeq).toSet
    val agg = Similarity.bruteForceTopKAgg(vecs.where(col("vec_id") < 3), vecs,
        "vec_id", "embedding", 3)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"), col("sim"))
      .collect().map(_.toSeq).toSet
    assert(agg == win)
  }

  test("topKByScore: heap keeps highest scores, ties break to smaller id") {
    import graft.functions.TopKAggregate.topKByScore
    val df = Seq((1L, 5.0, 10L), (1L, 5.0, 9L), (1L, 7.0, 3L), (1L, 1.0, 1L),
      (2L, 2.0, 2L)).toDF("g", "s", "id")
    val got = df.groupBy(col("g")).agg(topKByScore(col("s"), col("id"), 2).as("tk"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getLong(0), p.getDouble(1)))).toMap
    assert(got(1L) == Seq((3L, 7.0), (9L, 5.0))) // 9 beats 10 on the tie
    assert(got(2L) == Seq((2L, 2.0)))
  }

  test("quantizedTopK: wide rescore pool == exact brute force; narrow pool is a subset") {
    val exact = Similarity.bruteForceTopK(vecs.where(col("vec_id") < 2), vecs,
        "vec_id", "embedding", 3)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // rescoreFactor covering the whole corpus -> identical to exact.
    val wide = Similarity.quantizedTopK(vecs.where(col("vec_id") < 2), vecs,
        "vec_id", "embedding", k = 3, rescoreFactor = 10)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(wide == exact)
    // Narrow pool: k results still emitted, every one a true corpus id.
    val narrow = Similarity.quantizedTopK(vecs.where(col("vec_id") < 2), vecs,
        "vec_id", "embedding", k = 2, rescoreFactor = 1)
    assert(narrow.groupBy("query_id").count().collect().forall(_.getLong(1) == 2L))
    // Zero vector: quantized tier scores it 0, never crashes.
    val withZero = vecs.union(Seq((9L, Array(0.0f, 0.0f, 0.0f), 3)).toDF)
    val z = Similarity.quantizedTopK(withZero.where(col("vec_id") === 9L), withZero,
      "vec_id", "embedding", k = 2, rescoreFactor = 2)
    assert(z.count() == 2L)
  }

  test("nearDupPairs: finds the near-identical pair, orders ids, excludes self") {
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // cos ~ 0.994
    assert(pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 >= p._2))
  }

  test("lshNearDupPairs is a verified subset of the exact pairs") {
    val exact = Similarity.nearDupPairs(vecs, "vec_id", "embedding", 0.95)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNearDupPairs(vecs, "vec_id", "embedding",
        dim = 3, threshold = 0.95, nbits = 2)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }

  test("multi-table LSH recovers at least the single-table pairs, no duplicates") {
    def pairs(seeds: Seq[Long]) = Similarity.lshNearDupPairs(vecs, "vec_id",
        "embedding", dim = 3, threshold = 0.95, nbits = 2, seeds = seeds)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val single = pairs(Seq(42L))
    val multi = pairs(Seq(42L, 43L, 44L))
    assert(single.toSet.subsetOf(multi.toSet)) // table 0 shares the seed
    assert(multi.size == multi.toSet.size) // cross-table collisions dedup'd
  }

  test("LSH bucket: identical vectors share a bucket, deterministic across runs") {
    val df = Seq((0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-1.0f, -2.0f, -3.0f))).toDF("id", "v")
      .select(col("id"), Similarity.lshBucket(col("v"), dim = 3).as("b"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == got(1L))
    assert(got(0L) != got(2L)) // opposite vectors flip every sign bit
  }

  test("fused lshBucketsAll is bit-identical to per-seed lshBucket") {
    val seeds = Seq(42L, 43L, 44L)
    val rnd = new scala.util.Random(7)
    // Random vectors plus edge shapes: shorter and longer than dim (the
    // kernel buckets over the min(|vec|, dim) prefix, like the dot form).
    val rows = (0L until 200L).map(i => (i, Array.fill(5)(rnd.nextFloat() * 2 - 1))) ++
      Seq((900L, Array.fill(3)(rnd.nextFloat())), (901L, Array.fill(8)(rnd.nextFloat())))
    val df = rows.toDF("id", "v")
    val unfused = df.select(col("id"),
      array(seeds.map(s => Similarity.lshBucket(col("v"), dim = 5, nbits = 7, seed = s)): _*).as("b"))
    val fused = df.select(col("id"),
      Similarity.lshBucketsAll(col("v"), dim = 5, nbits = 7, seeds).as("b"))
    val u = unfused.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val f = fused.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(f == u)
    // A null element zeroes every bucket (the unfused otherwise(0) branch).
    val nulled = Seq((0L, Array[java.lang.Float](1.0f, null, 2.0f, 3.0f, 4.0f)))
      .toDF("id", "v")
      .select(Similarity.lshBucketsAll(col("v"), dim = 5, nbits = 7, seeds).as("b"))
      .collect().head.getSeq[Long](0)
    assert(nulled == Seq(0L, 0L, 0L))
  }

  test("autoNbits tracks corpus size at fixed occupancy, clamped") {
    assert(Similarity.autoNbits(20000L) == 11)
    assert(Similarity.autoNbits(200000L) == 14)
    assert(Similarity.autoNbits(2000000L) == 17)
    assert(Similarity.autoNbits(10L) == 8)          // floor clamp
    assert(Similarity.autoNbits(Long.MaxValue) == 24) // ceiling clamp
    // One decade adds ~log2(10) bits: buckets track n, occupancy stays flat.
    assert(Similarity.autoNbits(2000000L) - Similarity.autoNbits(20000L) == 6)
  }

  test("lshBucketStats counts the exact verify-stage candidate pairs") {
    val df = Seq((0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(1.1f, 2.1f, 3.1f)), (3L, Array(-1.0f, -2.0f, -3.0f)))
      .toDF("vec_id", "embedding")
    val bt = Similarity.lshBucketTable(df, "vec_id", "embedding", dim = 3,
      nbits = 2, seeds = Seq(42L))
    val stats = Similarity.lshBucketStats(bt).collect()
    assert(stats.length == 1)
    val candidates = stats.head.getAs[Long]("candidate_pairs")
    // Exact candidate count: sum over buckets of occ*(occ-1)/2, which must
    // equal the number of same-bucket (a<b) pairs the verify join scores.
    val manual = bt.select(col("id").as("a"), col("bucket"))
      .join(bt.select(col("id").as("b"), col("bucket")), Seq("bucket"))
      .where(col("a") < col("b")).count()
    assert(candidates == manual)
  }

  test("withL2Normalized: unit norms, zero vector stays zero, null passes, norm computed once") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(3.0f, 4.0f))),
      (2L, Some(Seq(0.0f, 0.0f))),
      (3L, None)).toDF("id", "v")
    val got = Similarity.withL2Normalized(df, "v", "u")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Seq[Double]]("u"))).toMap
    assert(got(1L) == Some(Seq(0.6, 0.8)))
    assert(got(2L) == Some(Seq(0.0, 0.0)), "zero vector must stay zero, never NaN")
    assert(got(3L).isEmpty, "null vector passes through")
    // The norm must be its own projection: exactly ONE graft_dot per row
    // feeding the transform, not one per element.
    val plan = Similarity.withL2Normalized(df, "v", "u")
      .queryExecution.executedPlan.toString
    val perRowDots = "graft_dot".r.findAllIn(plan).size
    assert(perRowDots <= 3, s"dot inlined per element ($perRowDots occurrences):\n$plan")
  }
}
