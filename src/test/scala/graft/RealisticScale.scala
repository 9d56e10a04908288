package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Realistic-density scale fixtures (`sbt 'Test/runMain
  * graft.RealisticCorpus <out> <nDocs> <nVecs>'`): unlike
  * [[ScaleData]]'s 10x replication — where EVERY doc has 9 exact copies
  * and the true pair set grows quadratically in the replica count — this
  * corpus plants ~1% exact-duplicate pairs and ~1% near-duplicate pairs
  * in otherwise-unique documents, the density a real crawl shows after
  * upstream URL dedup. Under fixed density the true pair set grows
  * LINEARLY with corpus size, so a 10x corpus must cost ~10x wall if and
  * only if the candidate tiers are pair-bound (the SCALE.md claim); a
  * quadratic-in-corpus tier shows up as a 100x wall instead.
  *
  * Documents: ~100 tokens each; half the tokens draw from a 1000-word
  * common vocabulary (individual tokens repeat heavily — the hot-token
  * realism that stresses the hot-shingle cap) and half are effectively
  * unique, so full TRIGRAMS almost never collide across unrelated docs.
  * Doc i with i%100==1 is an exact copy of doc i-1; doc i with
  * i%100==51 is a NEAR copy of doc i-1 (last 5 tokens replaced) — the
  * planted structure is pure pairs, never larger clusters.
  * Embeddings mirror the rule: i%100==1 copies vec i-1 exactly;
  * i%100==51 perturbs vec i-1 by ~0.1% (cosine ~0.999).
  */
object RealisticCorpus {

  private def mix(a: Long, b: Long): Long = {
    var z = a * 0x9E3779B97F4A7C15L + b
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def baseTokens(i: Long): Array[String] = {
    val n = 80 + Math.floorMod(mix(i, 0), 41L).toInt
    Array.tabulate(n) { j =>
      val r = mix(i, j + 1L)
      if (Math.floorMod(r, 2L) == 0) "w" + Math.floorMod(r >>> 8, 1000L)
      else "u" + java.lang.Long.toHexString(r >>> 1)
    }
  }

  /** Pure function of doc id — dup rules reference the NEIGHBOR's base
    * content without any cross-row dependency. */
  def docText(i: Long): String = {
    val m = Math.floorMod(i, 100L)
    if (m == 1 && i >= 1) baseTokens(i - 1).mkString(" ")
    else if (m == 51 && i >= 1) {
      val t = baseTokens(i - 1)
      var j = math.max(0, t.length - 5)
      while (j < t.length) { t(j) = "n" + java.lang.Long.toHexString(mix(i, j) >>> 1); j += 1 }
      t.mkString(" ")
    } else baseTokens(i).mkString(" ")
  }

  private def baseVec(i: Long, dim: Int): Array[Float] =
    Array.tabulate(dim)(d => (Math.floorMod(mix(i, 1000L + d), 2000001L) - 1000000L) / 1000000.0f)

  def vec(i: Long, dim: Int = 64): Array[Float] = {
    val m = Math.floorMod(i, 100L)
    if (m == 1 && i >= 1) baseVec(i - 1, dim)
    else if (m == 51 && i >= 1) {
      val v = baseVec(i - 1, dim)
      var d = 0
      while (d < dim) { v(d) = v(d) + (Math.floorMod(mix(i, 2000L + d), 2001L) - 1000L) / 1000000.0f; d += 1 }
      v
    } else baseVec(i, dim)
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_realistic")
    val nDocs = args.lift(1).map(_.toLong).getOrElse(50000L)
    val nVecs = args.lift(2).map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(nDocs).repartition(32).map(i => (i, docText(i)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    spark.range(nVecs).repartition(32)
      .map(i => (i, vec(i))).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"REALISTIC out=$out docs=$nDocs vecs=$nVecs")
    spark.stop()
  }
}

/** Probe (`sbt 'Test/runMain graft.RealisticProbe <dir> [skipExactEmb]'`):
  * times every dedup tier on a [[RealisticCorpus]] directory and prints
  * one JSON line per tier with wall seconds and the pair count found.
  * Tripwires: the exact tier must find EXACTLY the planted exact pairs;
  * shingle tiers must recover every planted pair (exact + near) — a
  * pair-count drift marks a recall regression, a super-linear wall marks
  * a candidate-generation regression.
  */
object RealisticProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_realistic")
    val skipExactEmb = args.lift(1).contains("skipExactEmb")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val nDocs = docs.count()
    val nVecs = embs.count()
    val plantedExact = nDocs / 100
    val plantedNear = (nDocs + 49) / 100
    println(s"""{"probe":"corpus","docs":$nDocs,"vecs":$nVecs,"plantedExact":$plantedExact,"plantedNear":$plantedNear}""")

    def timed(name: String)(pairs: => org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = pairs.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$name","sec":$dt%.2f,"pairs":$n}""")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      n
    }

    import graft.text.Dedup
    val ex = timed("dedup_exact_groups")(
      Dedup.exactDuplicates(docs, "doc_id", "text").where(col("cnt") > 1))
    require(ex == plantedExact, s"exact groups $ex != planted $plantedExact")
    val jac = timed("dedup_ngram_jaccard")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5,
        maxDocFreq = 100L, cache = df => df.persist()))
    require(jac >= plantedExact + plantedNear,
      s"jaccard pairs $jac < planted ${plantedExact + plantedNear}")
    timed("dedup_minhash_lsh")(
      Dedup.minHashLshPairs(docs, "doc_id", "text", n = 3, threshold = 0.5,
        maxDocFreq = 100L, cache = df => df.persist()))
    timed("dedup_simhash")(
      Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3, cache = df => df.persist()))
    timed("dedup_cluster_reps") {
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5, maxDocFreq = 100L, cache = df => df.persist())
      Dedup.clusterRepresentatives(docs.select(col("doc_id")), "doc_id", pairs,
        cache = df => df.persist())
    }

    import graft.vector.Similarity
    if (!skipExactEmb)
      timed("dedup_embedding_exact")(
        Similarity.nearDupPairs(embs, "vec_id", "embedding", threshold = 0.99))
    // Buckets auto-sized to the corpus (buckets-per-table ~ n/16) so the
    // candidate set stays ~linear in n — the knob a real deployment
    // scales with n, now codified as Similarity.autoNbits.
    val nbits = Similarity.autoNbits(nVecs)
    val lshSeeds = Seq(42L, 43L, 44L)
    timed("dedup_embedding_lsh")(
      Similarity.lshNearDupPairs(embs, "vec_id", "embedding", dim = 64,
        threshold = 0.99, nbits = nbits, seeds = lshSeeds))
    // Candidate-generation diagnostics: the verify stage scores exactly
    // candidate_pairs cosines, so candidates/true-pairs is the overshoot
    // ratio SCALE.md tracks across corpus scales.
    val stats = Similarity.lshBucketStats(
      Similarity.lshBucketTable(embs, "vec_id", "embedding", dim = 64,
        nbits = nbits, seeds = lshSeeds))
      .orderBy(col("tbl")).collect()
    val totalCand = stats.map(_.getAs[Long]("candidate_pairs")).sum
    val truePairs = nVecs / 100 + (nVecs + 49) / 100
    stats.foreach { r =>
      println(s"""{"probe":"lsh_buckets","tbl":${r.getAs[Int]("tbl")},"nbits":$nbits,""" +
        s""""n_buckets":${r.getAs[Long]("n_buckets")},"max_occ":${r.getAs[Long]("max_occ")},""" +
        s""""candidate_pairs":${r.getAs[Long]("candidate_pairs")}}""")
    }
    // truePairs can be 0 below ~51 vectors; Infinity/NaN is invalid JSON.
    val overshoot =
      if (truePairs > 0) f"${totalCand.toDouble / truePairs}%.1f" else "null"
    println(s"""{"probe":"lsh_candidates","nbits":$nbits,"total_candidates":$totalCand,"true_pairs":$truePairs,"overshoot":$overshoot}""")
    spark.stop()
  }
}
