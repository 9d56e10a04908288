package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.Dedup

/** Stage split for the MinHash-LSH recall audits: times the shared
  * collapsed-index build, the LSH tier, the exact tier, and the recall
  * join separately for the FULL corpus and the 50% SAMPLED form, in one
  * session — attributes why the sampled audit does not get cheap the way
  * its quadratic exact tier predicts.
  */
object RecallSplitProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def ms[T](f: => T): (T, Long) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1000000L)
    }
    def run(tag: String, sampled: Boolean): Unit = {
      val base = io.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      val docs = if (sampled)
        base.where(graft.ops.Sampling.hashBucket(col("doc_id"), Dedup.Md5Hash60) < 5000)
      else base
      val (c, tCollapse) = ms {
        val c0 = Dedup.exactCollapse(docs, "doc_id", "text", cache = df => df.persist())
        c0.reps.count(); c0.membership.count(); c0
      }
      val (idx, tIdx) = ms {
        val i = Dedup.countedShingleIndexCollapsed(c, n = 3, maxDocFreq = 100L,
          hashFn = Dedup.Md5Hash60).persist()
        i.count(); i
      }
      val (lsh, tLsh) = ms {
        val p = Dedup.minHashLshPairsFromIndex(idx, threshold = 0.5).persist()
        p.count(); p
      }
      val (exact, tExact) = ms {
        val p = Dedup.ngramJaccardPairsFromIndex(idx, threshold = 0.5).persist()
        p.count(); p
      }
      val (_, tRecall) = ms {
        graft.ops.Recall.pairRecall(
          Dedup.expandExactGroups(lsh, c.membership, "jaccard", idx, lit(1.0)),
          Dedup.expandExactGroups(exact, c.membership, "jaccard", idx, lit(1.0)),
          floor = 0.5).collect()
      }
      println(s"""{"probe":"recall_split","tag":"$tag","dir":"$dir","nDocs":${docs.count()},""" +
        s""""nReps":${c.reps.count()},"idxEntries":${idx.count()},""" +
        s""""msCollapse":$tCollapse,"msIdx":$tIdx,"msLsh":$tLsh,""" +
        s""""msExact":$tExact,"msRecall":$tRecall}""")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    run("warmup", sampled = true)
    run("full", sampled = false)
    run("sampled", sampled = true)
    spark.stop()
  }
}
