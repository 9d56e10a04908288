package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.Dedup

/** Structure probe for the `dedup_cluster_reps` gate: reports the
  * pair-graph statistics its cost is a function of (collapsed reps,
  * surviving index entries, Jaccard pairs, CC convergence rounds) plus
  * per-stage wall time. Exists to attribute round-over-round wall drift
  * to corpus-structure change (the driver regenerates testdata between
  * rounds) vs an engine regression: identical code on a regenerated
  * corpus converges in however many rounds THAT pair graph needs.
  */
object ClusterRepsProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      def ms[T](f: => T): (T, Long) = {
        val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1000000L)
      }
      val docs = io.Tables.documents(spark, dir)
      val (c, tCollapse) = ms(Dedup.exactCollapse(docs, "doc_id", "text",
        cache = df => df.persist()))
      val nDocs = docs.count()
      val nReps = c.reps.count()
      val (idx, _) = ms(Dedup.countedShingleIndexCollapsed(c, n = 3, maxDocFreq = 100L).persist())
      val (nIdx, tIdx) = ms(idx.count())
      val pairs = Dedup.ngramJaccardPairsFromIndex(idx, threshold = 0.5).persist()
      val (nPairs, tPairs) = ms(pairs.count())
      val ((_, rounds), tCc) = ms(Dedup.clusterRepresentativesWithRounds(
        c.reps.select(col("doc_id")), "doc_id", pairs,
        cache = df => df.persist()))
      println(s"PROBE $dir docs=$nDocs reps=$nReps idxEntries=$nIdx " +
        s"pairs=$nPairs ccRounds=$rounds " +
        s"msCollapse=$tCollapse msIdx=$tIdx msPairs=$tPairs msCc=$tCc")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
