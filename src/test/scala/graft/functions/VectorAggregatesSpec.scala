package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorAggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("vecMean: per-position mean, partition-count invariant") {
    val rows = Seq(
      ("a", Some(Seq(1.0f, 2.0f, 3.0f))),
      ("a", Some(Seq(3.0f, 4.0f, 5.0f))),
      ("a", None), // null array skipped, like any aggregate input row
      ("b", Some(Seq(10.0f, 20.0f, 30.0f))))
    for (parts <- Seq(1, 3, 7)) {
      val got = rows.toDF("g", "v").repartition(parts)
        .groupBy("g").agg(VectorAggregates.vecMean(col("v")).as("m"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      assert(got("a") == Seq(2.0, 3.0, 4.0), s"parts=$parts")
      assert(got("b") == Seq(10.0, 20.0, 30.0), s"parts=$parts")
    }
  }

  test("vecMean: a group of only-null arrays yields null, not a zero vector") {
    val got = Seq(("a", Option.empty[Seq[Float]]), ("a", Option.empty[Seq[Float]]))
      .toDF("g", "v")
      .groupBy("g").agg(VectorAggregates.vecMean(col("v")).as("m"))
      .collect()
    assert(got.length == 1 && got.head.isNullAt(1))
  }

  test("vecMean: a zero-length vector fails loudly (advice r9)") {
    // A dim-0 buffer serializes identically to the empty buffer, so
    // whether the group returned [] or null would depend on whether
    // partial-agg serialization ran — rejected like ragged input instead.
    val e = intercept[Exception] {
      Seq(("a", Seq.empty[Float]), ("a", Seq(1.0f)))
        .toDF("g", "v")
        .groupBy("g").agg(VectorAggregates.vecMean(col("v")).as("m"))
        .collect()
    }
    assert(String.valueOf(e.getMessage).contains("zero-length") ||
      String.valueOf(e.getCause).contains("zero-length"))
  }

  test("vecMean: ragged vectors in one group fail loudly") {
    val e = intercept[Exception] {
      Seq(("a", Seq(1.0f, 2.0f)), ("a", Seq(1.0f, 2.0f, 3.0f)))
        .toDF("g", "v")
        .groupBy("g").agg(VectorAggregates.vecMean(col("v")).as("m"))
        .collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("ragged") ||
      String.valueOf(e.getCause).contains("ragged"))
  }

  test("graft_vec_mean is callable from SQL") {
    GraftFunctions.register(spark)
    Seq((1L, Seq(2.0, 4.0)), (1L, Seq(4.0, 8.0))).toDF("g", "v")
      .createOrReplaceTempView("vm_probe")
    val got = spark.sql("SELECT graft_vec_mean(v) AS m FROM vm_probe GROUP BY g")
      .collect().map(_.getSeq[Double](0))
    assert(got.toSeq == Seq(Seq(3.0, 6.0)))
  }
}
