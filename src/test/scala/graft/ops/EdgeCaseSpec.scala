package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Empty-input and edge-shape behavior of the merge/window operators
  * (reference empty-input cases, tests/test_load.py:218-232).
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def empty = Seq.empty[(String, String, Double)].toDF("k", "q", "v")
  private def one = Seq(("a", "q1", 1.0)).toDF("k", "q", "v")

  test("merge operators tolerate empty sides") {
    assert(Merge.mergeUpsert(empty, one, Seq("k")).count() == 1)
    assert(Merge.mergeUpsert(one, empty, Seq("k")).count() == 1)
    assert(Merge.mergeUpsert(empty, empty, Seq("k")).count() == 0)
    assert(Merge.insertIfAbsent(empty, one, Seq("k")).count() == 1)
    assert(Merge.lastWriteWins(empty, Seq("k"), Seq(col("v").desc)).count() == 0)
  }

  test("topKPerGroup with k larger than any group returns all rows") {
    val got = Windows.topKPerGroup(one, Seq("k"), Seq(col("v").desc), 100)
    assert(got.count() == 1)
  }

  test("as-of join with empty right side null-pads every left row") {
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "l"))
      .toDF("user_id", "ts", "tag")
    val right = Seq.empty[(Long, java.sql.Timestamp, Double, Long)]
      .toDF("user_id", "ts", "px", "rid")
    val got = AsOf.asofJoinBackward(left, right, Seq("user_id"), "ts", Seq("px"), col("rid"))
    assert(got.count() == 1)
    assert(got.select("px").collect().head.isNullAt(0))
  }

  test("duplicateKeys on an empty frame is empty (gate passes vacuously)") {
    assert(Quality.duplicateKeys(empty, Seq("k", "q")).count() == 0)
  }
}
