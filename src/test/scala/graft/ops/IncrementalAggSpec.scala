package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val dec = DecimalType(15, 2)

  private def rows(n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (s"k${rnd.nextInt(5)}", BigDecimal(rnd.nextInt(100000))
      .setScale(2) / 100)).toDF("k", "v")
      .select(col("k"), col("v").cast(dec).as("v"))
  }

  test("merge of batch summaries == single-shot summary, any batch grouping") {
    val all = rows(500, 7L)
    val oneShot = IncrementalAgg.summarize(all, Seq("k"), col("v"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    for (splits <- Seq(Seq(100, 400), Seq(250, 125, 125), Seq(500))) {
      var off = 0L
      val withId = all.withColumn("_rid",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("k"), col("v"), monotonically_increasing_id())))
      val batches = splits.map { n =>
        val b = withId.where(col("_rid") > off && col("_rid") <= off + n).drop("_rid")
        off += n
        b
      }
      val merged = batches.tail.foldLeft(
        IncrementalAgg.summarize(batches.head, Seq("k"), col("v")))((st, b) =>
        IncrementalAgg.merge(st, IncrementalAgg.summarize(b, Seq("k"), col("v")), Seq("k")))
      val got = merged.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
      assert(got.keySet == oneShot.keySet, s"splits=$splits")
      got.foreach { case (k, vs) =>
        // decimal precision may widen through merges — compare values
        val exp = oneShot(k)
        assert(vs.head == exp.head, s"cnt $k")
        Seq(1, 2, 3).foreach(i => assert(
          vs(i).asInstanceOf[java.math.BigDecimal].compareTo(
            exp(i).asInstanceOf[java.math.BigDecimal]) == 0, s"col $i key $k splits=$splits"))
      }
    }
  }

  test("keys absent from one side survive the merge unchanged") {
    val a = Seq(("x", BigDecimal(1.50)), ("y", BigDecimal(2.00))).toDF("k", "v")
      .select(col("k"), col("v").cast(dec).as("v"))
    val b = Seq(("y", BigDecimal(3.00)), ("z", BigDecimal(4.00))).toDF("k", "v")
      .select(col("k"), col("v").cast(dec).as("v"))
    val merged = IncrementalAgg.merge(
      IncrementalAgg.summarize(a, Seq("k"), col("v")),
      IncrementalAgg.summarize(b, Seq("k"), col("v")), Seq("k"))
    val got = merged.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).doubleValue)).toMap
    assert(got == Map("x" -> ((1L, 1.5)), "y" -> ((2L, 5.0)), "z" -> ((1L, 4.0))))
  }

  test("null keys merge as one group (null-safe join)") {
    val a = Seq((Option.empty[String], BigDecimal(1.00))).toDF("k", "v")
      .select(col("k"), col("v").cast(dec).as("v"))
    val merged = IncrementalAgg.merge(
      IncrementalAgg.summarize(a, Seq("k"), col("v")),
      IncrementalAgg.summarize(a, Seq("k"), col("v")), Seq("k"))
    val got = merged.collect()
    assert(got.length == 1 && got.head.isNullAt(0) && got.head.getLong(1) == 2L)
  }
}
