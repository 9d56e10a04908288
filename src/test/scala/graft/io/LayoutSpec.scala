package graft.io

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import graft.SparkSpec

/** Physical-layout contracts (SCALE.md): partition pruning on
  * hive-partitioned state and shuffle-free joins on bucketed state.
  */
class LayoutSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("partitioned write prunes non-matching partitions at the scan") {
    val tmp = Files.createTempDirectory("layout_part").toString + "/t"
    (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "A" else "B"))
      .toDF("k", "part").write.mode("overwrite").partitionBy("part").parquet(tmp)
    val plan = spark.read.parquet(tmp).where(col("part") === "A")
      .queryExecution.executedPlan
    val scans = collectLeaves(plan).map(_.toString).mkString("\n")
    assert(scans.contains("part=A") || !scans.contains("part=B"),
      s"expected pruned partition listing, got:\n$scans")
    assert(spark.read.parquet(tmp).where(col("part") === "A").count() == 50)
  }

  test("metadata-only query never reads the binary payload column (SCALE.md multimodal claim)") {
    val tmp = Files.createTempDirectory("layout_bin").toString + "/t"
    Seq((1L, "png", Array[Byte](1, 2, 3)), (2L, "jpeg", Array[Byte](4, 5)))
      .toDF("id", "format", "payload").write.mode("overwrite").parquet(tmp)
    val plan = spark.read.parquet(tmp).groupBy("format").count()
      .queryExecution.executedPlan
    val scan = collectLeaves(plan).map(_.toString).mkString("\n")
    assert(scan.contains("format") && !scan.contains("payload"),
      s"payload column should be pruned from the scan:\n$scan")
  }

  test("bucketed state tables join without a shuffle on the bucket key") {
    val wh = Files.createTempDirectory("layout_bucket").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      for (t <- Seq("bkt_a", "bkt_b")) {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        Sinks.writeBucketedState(df, t, buckets = 8, keys = Seq("k"),
          location = Some(s"$wh/$t"))
      }
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      joined.collect() // finalize AQE plan
      val shuffles = collectWithSubqueries(joined.queryExecution.executedPlan) {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed join should be shuffle-free, found ${shuffles.size} exchanges")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq("bkt_a", "bkt_b").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
