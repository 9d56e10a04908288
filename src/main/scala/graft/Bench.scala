package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every contract query against
  * `SPARK_GRAFT_SF_DIR`, forcing full execution through the `noop` sink
  * (unlike `count()`, noop cannot let Catalyst prune the projections being
  * measured), and prints one JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JVM/codegen/parquet-footer costs land here, not on the
    // alphabetically-first query.
    SparkEntry.queries.get("q1_agg").foreach { fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // Optional comma-separated subset for local iteration
    // (SPARK_GRAFT_ONLY=corpus_clean,csv_roundtrip); unset = full contract.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in the contract: ${unknown.mkString(", ")}")
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Median-of-N per query (default 3, SPARK_GRAFT_REPS to override): a
    // single rep in a 122-query shared session absorbs 4-6× scheduling/GC
    // noise on the heaviest queries (round-5 artifact reported sf0.1
    // numbers ABOVE their own sf1 cost). The median discards the noisy
    // rep — including the first rep's one-time codegen compile — so the
    // artifact reports steady-state per-query cost.
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(3).max(1)
    def cleanup(): Unit = {
      // Release each query's untracked persists between measurements so
      // leaked cache blocks never skew (or accidentally speed up) later
      // queries. clearCache() only drops catalog-tracked relations —
      // localCheckpoint blocks (dedup_cluster_reps checkpoints per CC
      // round) and raw .persist()s live in getPersistentRDDs, and
      // shuffle/broadcast blocks are reclaimed by the ContextCleaner
      // only after their references are GC'd — hence all three steps.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    val results = selected.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup()
        dt
      }.sorted
      val dt = times(times.length / 2)
      // One parse-safe line per query AS IT COMPLETES: a bounded stdout
      // tail capture that truncates the final summary line still keeps
      // the per-query timings (they're the most recent lines).
      val repsJson = times.map(t => f"$t%.3f").mkString("[", ",", "]")
      println(f"""{"query":"$name","sec":$dt%.3f,"reps":$repsJson}""")
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Durable copy of the full artifact: survives any stdout truncation.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_local.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[bench] full artifact written to $out")
    spark.stop()
  }
}
