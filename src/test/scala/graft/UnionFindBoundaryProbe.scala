package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Boundary probe for the driver union-find fast path: times
  * `clusterRepresentatives` on a pair graph AT the SmallGraphEdges
  * ceiling (1 M edges over 2 M nodes — far larger than any realistic
  * contracted wave) and verifies the labeling against structural
  * expectations. Evidence that the ceiling is safely collectable: the
  * driver must absorb a 1 M-row collect plus UF in low seconds.
  */
object UnionFindBoundaryProbe {
  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toLong).getOrElse(1_000_000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
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
    val t0 = System.nanoTime()
    val labels = graft.text.Dedup.clusterRepresentatives(nodes, "id", pairs,
      cache = df => df.persist())
    labels.write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    val bad = labels.where(col("rep") =!= (col("id") - (col("id") % 100))).count()
    println(f"""{"probe":"uf_boundary","edges":$nEdges,"nodes":$nNodes,"sec":$dt%.2f,"mislabeled":$bad}""")
    require(bad == 0L, "union-find labeling diverged from the structural expectation")
    spark.stop()
  }
}
