package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 3000L).map(i => ((i % 3).toString, i * i)).toDF("k", "v")

  test("bucketOf is monotonic and bucketUpper bounds the bucket from above") {
    val checked = spark.range(0, 100000).toDF("v")
      .select(col("v"), QuantileSketch.bucketOf(col("v")).as("b"))
      .select(col("v"), col("b"), QuantileSketch.bucketUpper(col("b")).as("ub"))
    // Upper edge >= every member value; relative width <= 1/16.
    assert(checked.where(col("ub") < col("v")).count() == 0)
    assert(checked.where(col("ub").cast("double") > col("v") * 1.0625 + 1).count() == 0)
    // Monotonic: bucket never decreases as v grows.
    val buckets = checked.orderBy("v").select("b").collect().map(_.getLong(0))
    assert(buckets.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("bucketOf raises on negative values") {
    val e = intercept[Exception] {
      Seq(-1L).toDF("v").select(QuantileSketch.bucketOf(col("v"))).collect()
    }
    assert(e.getMessage.contains("non-negative"))
  }

  test("merge of batch sketches equals the single-shot sketch exactly") {
    val batches = (0 until 4).map(i => rows.where(pmod(col("v"), lit(4)) === i))
    val merged = batches.tail.foldLeft(
      QuantileSketch.summarize(batches.head, Seq("k"), col("v")))((st, b) =>
      QuantileSketch.merge(st, QuantileSketch.summarize(b, Seq("k"), col("v")), Seq("k")))
    val single = QuantileSketch.summarize(rows, Seq("k"), col("v"))
    val a = merged.orderBy("k").collect().map(_.toSeq)
    val b = single.orderBy("k").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("quantiles off the sketch are within the bucket width of exact") {
    val state = QuantileSketch.summarize(rows, Seq("k"), col("v"))
    val q = QuantileSketch.quantiles(state, Seq("k"),
      Seq(("p50", 1, 2), ("p99", 99, 100)))
    val exact = rows.groupBy("k").agg(
      expr("percentile(v, 0.5d)").as("e50"), expr("percentile(v, 0.99d)").as("e99"))
    val joined = q.join(exact, Seq("k"))
      .select(col("k"),
        (abs(col("p50").cast("double") / col("e50") - 1) <= 0.1).as("ok50"),
        (abs(col("p99").cast("double") / col("e99") - 1) <= 0.1).as("ok99"))
      .collect()
    assert(joined.nonEmpty && joined.forall(r => r.getBoolean(1) && r.getBoolean(2)))
  }

  test("null values are excluded and n counts sketched rows only") {
    val withNulls = Seq(("a", Some(10L)), ("a", None), ("a", Some(20L)))
      .toDF("k", "v")
    val s = QuantileSketch.summarize(withNulls, Seq("k"), col("v")).collect().head
    assert(s.getAs[Long]("n") == 2L)
  }
}
