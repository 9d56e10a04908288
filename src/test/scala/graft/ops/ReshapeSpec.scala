package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  private val wide = Seq((1L, 10.0, 100.0), (2L, 20.0, 200.0))
    .toDF("id", "m_a", "m_b")

  test("unpivot melts wide metrics to (id, metric, value) rows") {
    val long = Reshape.unpivotToLong(wide, Seq("id"), Seq("m_a", "m_b"))
    assert(long.columns.toSeq == Seq("id", "metric", "value"))
    val got = long.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "m_a", 10.0), (1L, "m_b", 100.0),
      (2L, "m_a", 20.0), (2L, "m_b", 200.0)))
  }

  test("pivot(unpivot(wide)) round-trips to the wide table") {
    val long = Reshape.unpivotToLong(wide, Seq("id"), Seq("m_a", "m_b"))
    val back = Reshape.pivotToWide(long, Seq("id"), "metric", "value", Seq("m_a", "m_b"))
    assert(back.columns.toSeq == Seq("id", "m_a", "m_b"))
    val got = back.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 10.0, 100.0), (2L, 20.0, 200.0)))
  }

  test("unpivot plans as a single stage: Expand with no Exchange (SCALE.md claim)") {
    val long = Reshape.unpivotToLong(wide, Seq("id"), Seq("m_a", "m_b"))
    val plan = long.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    assert(!plan.contains("Exchange"))
  }

  test("unpivot keeps null metric values as rows (reference melt semantics)") {
    val w = Seq((1L, Some(1.5), None: Option[Double])).toDF("id", "m_a", "m_b")
    val long = Reshape.unpivotToLong(w, Seq("id"), Seq("m_a", "m_b"))
    assert(long.count() == 2 &&
      long.where(col("value").isNull).select("metric").as[String].collect().toSeq == Seq("m_b"))
  }
}
