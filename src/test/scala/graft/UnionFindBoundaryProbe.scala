package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Boundary probe for the driver union-find fast path: times
  * `clusterRepresentatives` on synthetic pair graphs AT and ABOVE the
  * SmallGraphEdges ceiling (1 M edges over 2 M nodes — far larger than
  * any realistic contracted wave) and verifies each labeling against
  * structural expectations. Below/at the ceiling this evidences that
  * the driver safely absorbs the collect + UF; ABOVE it (round-17
  * verdict #8) it measures the distributed pointer-jumping fallback on
  * the same graph family, so the ceiling has a MEASURED cliff — the
  * cost step a pathological near-duplicate-farm corpus pays when its
  * contracted graph outgrows the fast path — rather than an assumed one.
  *
  * Run: `sbt 'Test/runMain graft.UnionFindBoundaryProbe [edges1,edges2,...]'`
  * (default `1000000,1500000`: at the ceiling, and 1.5x over it).
  */
object UnionFindBoundaryProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption
      .map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(1_000_000L, 1_500_000L))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = sizes.map { nEdges =>
      // Chain segments of 100 nodes: node i links to i+1 unless i % 100 == 99
      // -> nEdges edges, ~nEdges/99 components of diameter 99 each, every
      // label provably floor(i/100)*100.
      val pairs = spark.range(nEdges + nEdges / 100)
        .where(col("id") % 100 =!= 99)
        .limit(nEdges.toInt)
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
        .persist()
      val nodes = pairs.select(col("doc_a").as("id"))
        .unionByName(pairs.select(col("doc_b").as("id"))).distinct().persist()
      val nNodes = nodes.count(); pairs.count()
      val path = if (nEdges <= graft.text.Dedup.SmallGraphEdges) "driver_uf"
        else "distributed_pj"
      val t0 = System.nanoTime()
      val labels = graft.text.Dedup.clusterRepresentatives(nodes, "id", pairs,
        cache = df => df.persist())
      labels.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val bad = labels.where(col("rep") =!= (col("id") - (col("id") % 100))).count()
      require(bad == 0L,
        s"union-find labeling diverged from the structural expectation at $nEdges")
      pairs.unpersist(true); nodes.unpersist(true)
      f""""e$nEdges":{"path":"$path","nodes":$nNodes,"sec":$dt%.2f,"mislabeled":$bad}"""
    }
    println(results.mkString("""{"probe":"uf_boundary",""", ",", "}"))
    spark.stop()
  }
}
