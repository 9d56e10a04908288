package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector similarity over `array<float>` embedding columns: cosine via
  * the custom codegen'd DotProduct expression (array higher-order
  * functions are interpreted — see [[dot]]), brute-force top-k as the
  * exact baseline (window and bounded-heap-aggregate forms), and IVF /
  * random-hyperplane-LSH variants as the scale path — centroid or bucket
  * assignment turns ANN into an equi-join on a cell id, which partitions
  * cleanly across a 1000-executor cluster; brute force is
  * O(|queries| x |corpus|) and is only the small-|queries| baseline.
  */
object Similarity {

  /** Dot product via the custom codegen'd loop expression
    * ([[graft.functions.VectorExpressions.DotProduct]]). The pure-built-in
    * alternatives both lose: array higher-order functions are
    * CodegenFallback (interpreted lambda + allocation per call), and a
    * statically unrolled element_at chain generates a method past the
    * JIT's HugeMethodLimit (measured 3x slower than even the HOF form on
    * the O(n^2) near-dup join). Left-to-right accumulation in double.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotFast(a, b)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; zero-norm vectors yield null (not an error). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n > 0, d / n)
  }

  /** Project an L2-NORMALIZED copy of `vecCol` as `outCol` (unit vectors
    * make cosine a plain dot — the standard pre-ANN normalization).
    * The norm is computed ONCE per row in its own projection: inlined
    * inside the per-element lambda, Catalyst would re-evaluate the full
    * dot product per element (dim× the work — 64× on these embeddings).
    * Zero vectors normalize to zero (never NaN); null vectors pass
    * through null. Elements divide in double.
    */
  def withL2Normalized(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn("_l2n", l2Norm(col(vecCol)))
      .withColumn(outCol,
        when(col(vecCol).isNull, lit(null))
          .when(col("_l2n") === 0.0,
            transform(col(vecCol), _ => lit(0.0)))
          .otherwise(transform(col(vecCol),
            x => x.cast(DoubleType) / col("_l2n"))))
      .drop("_l2n")

  /** Exact brute-force top-k neighbors for each query vector.
    * Input frames must expose (idCol, vecCol). Excludes self-matches by id.
    * Output: (query_id, rank, neighbor_id, sim). The small side (queries)
    * is broadcast, so the corpus is scanned once, partition-parallel, with
    * no shuffle until the final per-query top-k window on |q| x |corpus|
    * scored rows.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Brute-force top-k via the bounded-heap aggregate
    * ([[graft.functions.TopKAggregate]]): same output as
    * [[bruteForceTopK]], but each map partition reduces to k pairs per
    * query BEFORE the shuffle — exchange volume O(k x partitions) per
    * query instead of O(|corpus|). The form that survives a 100 TB corpus.
    */
  def bruteForceTopKAgg(queries: DataFrame, corpus: DataFrame, idCol: String,
                        vecCol: String, k: Int): DataFrame = {
    import graft.functions.TopKAggregate.topKByScore
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qvec"), col("cvec")))
    scored.groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "pair")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("pair.id").as("neighbor_id"), col("pair.score").as("sim"))
  }

  /** Two-tier quantized search: rank candidates by the INT8-code dot
    * product (4x less data per comparison — at 100 TB the recall tier
    * reads only the quantized column), keep `k * rescoreFactor` per
    * query, then rescore exactly over the float vectors and emit the true
    * top-k. The approximate score `dot(q8, c8) / (qscale * cscale)`
    * approximates the float dot; a vector whose true rank is inside k
    * but whose quantized rank falls outside k * rescoreFactor is missed —
    * the standard, tunable recall/cost trade. Zero-scale (all-zero)
    * vectors score 0 in the recall tier, like their float counterparts.
    *
    * At gate scale the float vectors simply travel alongside the codes;
    * a production corpus re-joins the float column by id for the rescore
    * set only (k * rescoreFactor rows per query, not the corpus).
    */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, k: Int, rescoreFactor: Int = 4): DataFrame = {
    import graft.functions.VectorExpressions.int8Quantize
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      int8Quantize(col(vecCol)).as("qq"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      int8Quantize(col(vecCol)).as("cq"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("approx",
        when(col("qq.scale") > 0 && col("cq.scale") > 0,
          dot(col("qq.q"), col("cq.q")) / (col("qq.scale") * col("cq.scale")))
          .otherwise(lit(0.0)))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id").asc)
    val candidates = scored.withColumn("arank", row_number().over(wA))
      .where(col("arank") <= k * rescoreFactor)
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    candidates.withColumn("sim", cosine(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(wE)).where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Centroids from a labeled corpus: per-label mean vector, computed by
    * positional explode + per-(label, pos) average — one shuffle keyed on
    * (label, pos), then re-assembled into arrays. At corpus scale this is
    * the map-side-combinable form (a partial sum per partition per label).
    */
  def centroids(corpus: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val exploded = corpus.select(col(labelCol).as("centroid_id"),
        posexplode(col(vecCol)).as(Seq("pos", "v")))
    // DECIMAL sum / exact count, divided in double: partition-order-
    // independent (a double sum across a shuffled group is not), so
    // centroids — and every IVF ranking built on them — are deterministic
    // run to run AND exactly replicable by an independent engine (decimal
    // `avg` would round in engine-specific decimal space first).
    exploded.groupBy("centroid_id", "pos")
      .agg((sum(col("v").cast(DecimalType(27, 12))).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("m"))
      .groupBy("centroid_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("centroid_id"), transform(col("pm"), x => x.getField("m")).as("cvec"))
  }

  /** IVF approximate top-k: assign every query to its `nprobe` nearest
    * centroids (the centroid table is tiny and always broadcast), then
    * search only corpus vectors whose label falls in the probed cells.
    * Same output shape as [[bruteForceTopK]]; recall < 1 by construction.
    *
    * `broadcastProbes` picks the probe-side join strategy: `true` (the
    * default, right for interactive query batches) broadcasts the
    * |queries| x nprobe probe rows — each carrying a full float vector —
    * to every corpus partition; `false` is the bulk-labeling path
    * (corpus-as-queries), where that broadcast would overflow: the probe
    * set is shuffled and equi-joined on `centroid_id` instead. Both
    * shapes are pinned in PlanContractSpec.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, labelCol: String, k: Int, nprobe: Int,
              broadcastProbes: Boolean = true): DataFrame = {
    val cents = centroids(corpus, labelCol, vecCol)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("centroid_id").asc)
    val probes = q.join(broadcast(cents), lit(true))
      .withColumn("csim", cosine(col("qvec"), col("cvec")))
      .withColumn("crank", row_number().over(probeW))
      .where(col("crank") <= nprobe)
      .select(col("query_id"), col("qvec"), col("centroid_id"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"),
      col(labelCol).as("centroid_id"))
    val probeSide = if (broadcastProbes) broadcast(probes)
                    else probes.hint("shuffle_hash")
    val scored = c.join(probeSide, Seq("centroid_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qvec"), col("nvec")))
    // Map-side partial top-k (bounded heap) — the exchange carries k pairs
    // per query per partition, not every scored row in the probed cells.
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKAggregate.topKByScore(col("sim"), col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "pair")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("pair.id").as("neighbor_id"), col("pair.score").as("sim"))
  }

  /** Production-path centroid recompute: one [[graft.functions.
    * VectorAggregates.vecMean]] buffer per (cell, partition) — the
    * exchange carries one dim-length DOUBLE vector per cell per
    * partition, and the sums run in double, ~an order of magnitude
    * cheaper than [[centroids]]' per-element DECIMAL path. The price is
    * bit-exactness: double sums are partition-order-dependent in the
    * last ulp, so a fit built on this is not independently replicable —
    * the oracle gates use [[centroids]]; swap this in at 100 TB where
    * nobody replays the fit bit-for-bit (assignments differing in a
    * boundary ulp are equally valid clusterings).
    */
  def centroidsFast(corpus: DataFrame, labelCol: String, vecCol: String): DataFrame =
    corpus.groupBy(col(labelCol).as("centroid_id"))
      .agg(graft.functions.VectorAggregates.vecMean(col(vecCol)).as("cvec"))

  /** Scan-side nearest-centroid assignment: `cents` (collected, k×dim
    * doubles) rides into the [[graft.functions.VectorExpressions
    * .NearestCentroid]] kernel as a reference object, so assignment is a
    * pure projection — one codegen'd k×dim loop per row, zero joins,
    * zero shuffles (the MLlib-KMeans broadcast shape, expressed in
    * Catalyst). Highest cosine wins, ties to the SMALLEST centroid id —
    * a total order, so assignment is deterministic and independently
    * replicable. Zero-norm pairs score -2.0, below every real cosine.
    * (The earlier composed form — array_max over k typedLit cosine
    * structs — generated code past the codegen size limits and ran the
    * whole stage interpreted: 45 s vs 2 s on the sf10 assignment.)
    */
  private def nearestCentroid(vec: Column, cents: Seq[(Long, Seq[Double])]): Column = {
    require(cents.nonEmpty, "nearestCentroid needs at least one centroid")
    val sorted = cents.sortBy(_._1)
    graft.functions.VectorExpressions.nearestCentroid(vec,
      sorted.map(_._1).toArray, sorted.map(_._2.toArray).toArray)
  }

  /** Deterministic spherical k-means (Lloyd): seeds = the k vectors
    * with the smallest (md5-derived hash of id, id) — equally
    * deterministic and engine-replicable as smallest-id seeding, but
    * decorrelated from data LAYOUT: id order tracks insert order, so
    * id-ordered seeds turn "the first k docs are near-duplicates" into
    * k coincident centroids; a hash spread picks k docs scattered
    * uniformly over the corpus regardless of how it was loaded. Then
    * `iters` rounds of assign → decimal-mean recompute ([[centroids]] —
    * order-independent sums, so the fit is identical run to run and
    * engine to engine). Each round is one scan-side assignment plus one
    * map-side-combinable (cell, pos) aggregation; the k×dim centroid
    * table is collected per round (bounded by k — the textbook
    * distributed-Lloyd driver state) and re-embedded as literals. Cells
    * that lose all members simply drop out (no respawn heuristic —
    * deterministic beats clever here).
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int,
                      exact: Boolean = true): Seq[(Long, Seq[Double])] = {
    require(k >= 1, s"k-means needs k >= 1, got $k")
    require(iters >= 0, s"negative iterations: $iters")
    val seedHash =
      graft.functions.Hashes.Md5Hash60(col(idCol).cast(StringType))
    var cents: Seq[(Long, Seq[Double])] =
      corpus.orderBy(seedHash.asc, col(idCol).asc).limit(k)
        .select(col(idCol).cast(LongType).as("centroid_id"),
          transform(col(vecCol), x => x.cast(DoubleType)).as("cvec"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    for (_ <- 1 to iters) {
      val labeled = corpus.withColumn("_kx_cid", nearestCentroid(col(vecCol), cents))
      // exact = decimal means (bit-replicable, the oracle-gate path);
      // false = the vecMean double path ([[centroidsFast]] — the 100 TB
      // default, ~10x cheaper per element, ulp-order-dependent).
      val recomputed =
        if (exact) centroids(labeled, "_kx_cid", vecCol)
        else centroidsFast(labeled, "_kx_cid", vecCol)
      cents = recomputed
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
        .sortBy(_._1)
    }
    cents
  }

  /** Corpus labeled with its LEARNED k-means cell (fit via
    * [[kmeansCentroids]], final assignment as a scan-side projection) —
    * the IVF index-build step when no natural partition label exists, or
    * when the natural label clusters poorly (the label-IVF recall
    * ceiling is ~nprobe/ncells on unclustered labels; learned cells
    * concentrate true neighbors into probed cells instead).
    */
  def withKmeansLabel(corpus: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int,
                      outCol: String = "centroid_id",
                      exact: Boolean = true): DataFrame =
    corpus.withColumn(outCol,
      nearestCentroid(col(vecCol),
        kmeansCentroids(corpus, idCol, vecCol, k, iters, exact)))

  /** Exact embedding-cosine near-duplicate pairs: all (a < b) with
    * cosine >= threshold. Norms are precomputed once per vector in their
    * own projection (not once per pair). O(n^2) compare — this is the
    * exact tier for modest corpora and the verifier behind
    * [[lshNearDupPairs]]; at 100 TB use the LSH form for candidates.
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val a = corpus.select(col(idCol).as("doc_a"), col(vecCol).as("va"))
      .withColumn("na", sqrt(dot(col("va"), col("va"))))
    val b = corpus.select(col(idCol).as("doc_b"), col(vecCol).as("vb"))
      .withColumn("nb", sqrt(dot(col("vb"), col("vb"))))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("sim") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("sim"))
  }

  /** LSH-bucketed embedding near-dup: candidates share a random-hyperplane
    * bucket in at least one of the `seeds` hash tables (equi-join on
    * (table, bucket id) — partitions cleanly at corpus scale), then exact
    * cosine verification. Recall < 1 by construction (pairs split across
    * buckets in EVERY table are missed); each extra table multiplies the
    * miss probability by (1 - p) for per-table collision rate p — the
    * standard multi-table LSH recall knob (lowering `nbits` is the other).
    *
    * Verification runs INLINE in the bucket self-join — vectors ride the
    * join inputs (3n short rows) and the cosine is computed and filtered
    * in the join's own codegen stage, with the few surviving pairs
    * deduplicated at the end (the same pair colliding in several tables
    * recomputes an identical double, so the distinct is exact). The
    * alternative — distinct the candidate ID pairs first, then re-attach
    * vectors by id — shuffles the full candidate set (≈ n²·tables/2^nbits
    * rows) through a distinct plus two wide joins, which MEASURED 2x
    * slower at 10x scale: candidate multiplicity is bounded by the table
    * count (≤3 recomputes) while the candidate set itself scales
    * quadratically, so recomputing a few sims is far cheaper than
    * materializing and re-joining the pair list.
    */
  def lshNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                      dim: Int, threshold: Double, nbits: Int = 8,
                      seeds: Seq[Long] = Seq(42L)): DataFrame = {
    require(seeds.nonEmpty, "lshNearDupPairs needs at least one hash-table seed")
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val bucketed = base
      .select(col("id"), col("v"), col("nrm"),
        posexplode(lshBucketsAll(col("v"), dim, nbits, seeds)).as(Seq("tbl", "bucket")))
    bucketed.select(col("id").as("doc_a"), col("v").as("va"), col("nrm").as("na"),
        col("tbl"), col("bucket"))
      .join(bucketed.select(col("id").as("doc_b"), col("v").as("vb"), col("nrm").as("nb"),
        col("tbl"), col("bucket")), Seq("tbl", "bucket"))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("sim") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("sim"))
      .distinct()
  }

  /** The LSH bucket table as PERSISTED state: (id, v, nrm, tbl, bucket)
    * for every (vector, hash table) pair — what a growing vector corpus
    * stores so new batches join against it without re-hashing history
    * ([[incrementalLshNearDup]]).
    */
  def lshBucketTable(corpus: DataFrame, idCol: String, vecCol: String,
                     dim: Int, nbits: Int = 8,
                     seeds: Seq[Long] = Seq(42L)): DataFrame = {
    require(seeds.nonEmpty, "lshBucketTable needs at least one hash-table seed")
    corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .select(col("id"), col("v"), col("nrm"),
        posexplode(lshBucketsAll(col("v"), dim, nbits, seeds)).as(Seq("tbl", "bucket")))
  }

  /** Incremental embedding near-dup: a NEW vector batch against the
    * accepted corpus's persisted [[lshBucketTable]] plus itself — the
    * vector twin of [[graft.text.Dedup.incrementalNearDupPairs]].
    * History is never re-paired; each wave costs the batch self-join
    * plus one bucket equi-join against the state table. Verification is
    * inline (the [[lshNearDupPairs]] shape). Output: (doc_a, doc_b, sim,
    * src) — src='state' pairs carry the state id as doc_a and the batch
    * id as doc_b.
    */
  def incrementalLshNearDup(batch: DataFrame, stateBuckets: DataFrame,
                            idCol: String, vecCol: String,
                            dim: Int, threshold: Double, nbits: Int = 8,
                            seeds: Seq[Long] = Seq(42L)): DataFrame = {
    val self = lshNearDupPairs(batch, idCol, vecCol, dim, threshold, nbits, seeds)
      .withColumn("src", lit("batch"))
    val bb = lshBucketTable(batch, idCol, vecCol, dim, nbits, seeds)
    val cross = stateBuckets
      .select(col("id").as("doc_a"), col("v").as("va"), col("nrm").as("na"),
        col("tbl"), col("bucket"))
      .join(bb.select(col("id").as("doc_b"), col("v").as("vb"), col("nrm").as("nb"),
        col("tbl"), col("bucket")), Seq("tbl", "bucket"))
      // An id present in BOTH state and batch (a replayed wave, an
      // upserted vector) would otherwise pair with itself at sim 1.0 and
      // make an incremental-accept policy drop the doc against its own
      // history.
      .where(col("doc_a") =!= col("doc_b"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("sim") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("sim"))
      .distinct()
      .withColumn("src", lit("state"))
    self.unionByName(cross)
  }

  /** Random-hyperplane LSH bucket id (`nbits` sign bits from fixed seeded
    * hyperplanes): vectors in the same bucket are ANN candidates. The
    * hyperplanes are derived deterministically from (seed, bit, pos) via a
    * splitmix-style integer mix and materialized as LITERAL ARRAYS, so
    * each projection runs in the compact codegen'd [[dot]] loop. (The
    * previous form — a statically unrolled `element_at` chain of dim x
    * nbits terms — is exactly the HugeMethodLimit JIT-killing anti-pattern
    * VectorExpressions documents: it benchmarked 4x slower than even the
    * exact O(n^2) tier.) Single-table form; the bucketing paths use the
    * fused [[lshBucketsAll]], which computes every table in one vector
    * pass with bit-identical results (pinned in SimilaritySpec).
    */
  def lshBucket(vec: Column, dim: Int, nbits: Int = 8, seed: Long = 42L): Column = {
    val bits = (0 until nbits).map { b =>
      val plane = array((0 until dim).map(p => lit(hyperplaneCoef(seed, b, p))): _*)
      when(dot(vec, plane) > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Flattened `[table][bit][pos]` hyperplane coefficients for the fused
    * bucketing kernel — same [[hyperplaneCoef]] planes as [[lshBucket]].
    */
  def planesFor(dim: Int, nbits: Int, seeds: Seq[Long]): Array[Double] = {
    val planes = new Array[Double](seeds.size * nbits * dim)
    for ((s, t) <- seeds.zipWithIndex; b <- 0 until nbits; p <- 0 until dim)
      planes((t * nbits + b) * dim + p) = hyperplaneCoef(s, b, p)
    planes
  }

  /** All hash-table bucket ids for a vector as `array<long>` (index =
    * table), via the one-pass codegen'd
    * [[graft.functions.VectorExpressions.LshBuckets]] kernel —
    * bit-identical to `seeds.map(lshBucket(vec, dim, nbits, _))`.
    */
  def lshBucketsAll(vec: Column, dim: Int, nbits: Int, seeds: Seq[Long]): Column =
    graft.functions.VectorExpressions.lshBuckets(
      vec, planesFor(dim, nbits, seeds), seeds.size, nbits, dim)

  /** Bucket-count knob sized to the corpus, not a constant — the
    * `shuffle.partitions` of ANN (SCALE.md). Buckets-per-table ~
    * n / targetOccupancy, so expected candidate pairs stay ~linear in n
    * (sum over buckets of occ^2/2 ~ n * targetOccupancy / 2 per table)
    * instead of n^2 / 2^nbits under a fixed nbits. Clamped to [minBits,
    * maxBits]; ceil keeps occupancy <= target (the error side that
    * over-partitions, never the side that lets candidates go quadratic).
    */
  def autoNbits(n: Long, targetOccupancy: Int = 16,
                minBits: Int = 8, maxBits: Int = 24): Int = {
    require(n > 0 && targetOccupancy > 0, "autoNbits needs positive n and occupancy")
    val bits = math.ceil(math.log(n.toDouble / targetOccupancy) / math.log(2.0)).toInt
    math.min(maxBits, math.max(minBits, bits))
  }

  /** Candidate-generation diagnostics over a [[lshBucketTable]]: per hash
    * table, the occupied-bucket count, the max occupancy, and the exact
    * candidate-pair count the verify stage will score (sum over buckets of
    * occ*(occ-1)/2). This is the number to watch when sizing `nbits`: the
    * verify cost is candidate_pairs x one cosine, so candidates/true-pairs
    * is the LSH overshoot ratio (SCALE.md tracks it across corpus scales).
    */
  def lshBucketStats(buckets: DataFrame): DataFrame =
    buckets.groupBy(col("tbl"), col("bucket")).agg(count(lit(1)).as("occ"))
      .groupBy(col("tbl")).agg(
        count(lit(1)).as("n_buckets"),
        max(col("occ")).as("max_occ"),
        sum((col("occ") * (col("occ") - lit(1))).cast(LongType) / 2)
          .cast(LongType).as("candidate_pairs"))

  /** Deterministic hyperplane coefficient for (seed, bit, pos): splitmix-
    * style integer mix mapped to [-1, 1). Public so independent
    * verification engines can replicate the exact planes.
    */
  def hyperplaneCoef(seed: Long, b: Int, p: Int): Double = {
    var z = seed + b.toLong * 0x9E3779B97F4A7C15L + p.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
  }
}
