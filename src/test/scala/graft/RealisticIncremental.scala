package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-family probe over a [[RealisticCorpus]] directory
  * (`sbt 'Test/runMain graft.RealisticIncremental <dir>'`): splits the
  * corpus into a history half (even ids — the persisted state a
  * deployment maintains) and a batch half (odd ids — the arriving
  * ingest), builds the state tables UNTIMED, then times the incremental
  * operators alone: the pair fold (batch-internal + batch-vs-state
  * candidates) and the contracted-graph CC label maintenance. At fixed
  * ~1 % duplicate density the planted pair set grows linearly with the
  * corpus, so a state-size-independent fold must show ≈ linear wall in
  * the BATCH across corpus sizes — a super-linear wall marks a
  * history-rescan regression (the thing the incremental forms exist to
  * avoid at 100 TB).
  *
  * Tripwire: planted pairs couple id i to id i-1 (RealisticCorpus
  * docText), i.e. always one even + one odd endpoint, so EVERY planted
  * exact+near pair must surface in the incremental fold's batch-vs-state
  * pairs; a shortfall is a recall regression, not noise.
  */
object RealisticIncremental {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_realistic")
    // Partition count is the one knob a cluster scales with the data —
    // SPARK_GRAFT_PARTS lets the decade runs size partitions to the
    // corpus (32 spills badly at 5 M docs; a real deployment would never
    // run a 10× corpus on the same partition count).
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.Dedup

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count()
    val plantedPairs = nDocs / 100 + (nDocs + 49) / 100 // exact + near
    println(s"""{"probe":"corpus","docs":$nDocs,"plantedPairs":$plantedPairs}""")

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }

    // ---- UNTIMED state construction (the deployment's standing tables)
    val root = graft.util.Scratch.dir("realistic_inc")
    val hist = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val hc = Dedup.exactCollapse(hist, "doc_id", "text", cache = df => df.persist())
    val hidx = Dedup.countedShingleIndexCollapsed(hc, n = 3, maxDocFreq = 100L,
      hashFn = Dedup.Md5Hash60).persist()
    val repLabels = Dedup.clusterRepresentatives(
      hc.reps.select(col("doc_id")), "doc_id",
      Dedup.ngramJaccardPairsFromIndex(hidx, threshold = 0.5),
      cache = df => df.persist())
    hc.membership
      .join(repLabels.select(col("doc_id").as("rep_id"), col("rep").as("_rl")), Seq("rep_id"))
      .join(hidx.select(col("doc_id").as("rep_id")).distinct()
        .withColumn("_survived", lit(true)), Seq("rep_id"), "left")
      .select(col("doc_id"),
        when(col("_survived") || col("doc_id") === col("rep_id"), col("_rl"))
          .otherwise(col("doc_id")).as("rep"))
      .write.parquet(root + "/labels")
    hidx.write.parquet(root + "/rep_index")
    hc.membership.write.parquet(root + "/membership")
    cleanup()

    // ---- TIMED: the incremental pair fold
    val batchDocs = docs.where(pmod(col("doc_id"), lit(2)) =!= 0)
    def freshState() = Dedup.CollapsedIndex(
      spark.read.parquet(root + "/rep_index"),
      spark.read.parquet(root + "/membership"))

    var pairsFound = 0L
    locally {
      val t0 = System.nanoTime()
      val batch = Dedup.collapsedIndex(batchDocs, "doc_id", "text",
        n = 3, maxDocFreq = 100L, hashFn = Dedup.Md5Hash60,
        cache = df => df.persist())
      pairsFound = Dedup.incrementalNearDupPairsCollapsed(
        batch, freshState(), threshold = 0.5).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"incremental_pairs","sec":$dt%.2f,"pairs":$pairsFound}""")
      cleanup()
    }
    require(pairsFound >= plantedPairs,
      s"incremental pairs $pairsFound < planted $plantedPairs — recall regression")

    // ---- TIMED: contracted-graph CC label maintenance
    locally {
      val t0 = System.nanoTime()
      val batch = Dedup.collapsedIndex(batchDocs, "doc_id", "text",
        n = 3, maxDocFreq = 100L, hashFn = Dedup.Md5Hash60,
        cache = df => df.persist())
      val n = Dedup.clusterRepresentativesIncrementalCollapsed(
        spark.read.parquet(root + "/labels"),
        batch.membership.select(col("doc_id"), col("rep_id")),
        Dedup.incrementalNearDupPairsCollapsed(batch, freshState(), threshold = 0.5),
        cache = df => df.persist()).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"incremental_cc_fold","sec":$dt%.2f,"labels":$n}""")
      require(n == nDocs, s"label table covers $n of $nDocs docs")
      cleanup()
    }
    spark.stop()
  }
}
