package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches the plain join (inner and left)") {
    val probe = Seq((1, "a1"), (1, "a2"), (1, "a3"), (2, "b1"), (3, "c1"))
      .toDF("k", "pv")
    val build = Seq((1, "x"), (2, "y"), (4, "z")).toDF("k", "bv")
    for (jt <- Seq("inner", "left")) {
      val plain = probe.join(build, Seq("k"), jt)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val salted = Skew.saltedJoin(probe, build, Seq("k"), buckets = 4, joinType = jt)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(salted == plain, s"join type $jt")
    }
  }

  test("saltedJoin spreads a hot key over multiple salt partitions") {
    val probe = (0 until 1000).map(i => (1, i)).toDF("k", "i")
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(8)).cast("int"))
    val distinctSalts = salted.select("_salt").distinct().count()
    assert(distinctSalts > 4) // the hot key's rows land in most buckets
  }

  test("metrics listener records action durations and output rows") {
    val rec = Metrics.attach(spark)
    try {
      Seq((1, "a"), (2, "b")).toDF("k", "v").collect()
      rec.awaitQuiesce(spark)
      val got = rec.metrics
      assert(got.nonEmpty)
      assert(got.forall(_.durationMs >= 0))
    } finally rec.detach(spark)
  }
}
