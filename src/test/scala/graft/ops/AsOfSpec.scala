package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward as-of join: latest prior right value, inclusive at equal ts") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, ts("2024-01-01 12:00:00"), "l2"),
      (2L, ts("2024-01-01 09:00:00"), "l3")) // no prior right row -> null
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10.0, 100L),
      (1L, ts("2024-01-01 12:00:00"), 20.0, 101L), // equal ts: included
      (3L, ts("2024-01-01 08:00:00"), 99.0, 102L))
      .toDF("user_id", "ts", "px", "rid")

    val got = AsOf.asofJoinBackward(left, right, Seq("user_id"), "ts",
        Seq("px"), col("rid"))
      .select(col("tag"), col("px"))
      .collect().map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got("l1").contains(10.0))
    assert(got("l2").contains(20.0)) // inclusive <=
    assert(got("l3").isEmpty)        // no prior purchase
  }

  test("forward as-of join: earliest following right value, inclusive at equal ts") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),  // -> 12:00 row
      (1L, ts("2024-01-01 12:00:00"), "l2"),  // equal ts: included
      (1L, ts("2024-01-01 13:00:00"), "l3"))  // nothing after -> null
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10.0, 100L),
      (1L, ts("2024-01-01 12:00:00"), 20.0, 101L))
      .toDF("user_id", "ts", "px", "rid")
    val got = AsOf.asofJoinForward(left, right, Seq("user_id"), "ts", Seq("px"), col("rid"))
      .select(col("tag"), col("px"))
      .collect().map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got("l1").contains(20.0))
    assert(got("l2").contains(20.0))
    assert(got("l3").isEmpty)
  }

  test("forward tiebreak mirrors backward: smallest tiebreaker wins") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "l")).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0, 1L),
      (1L, ts("2024-01-01 10:00:00"), 2.0, 2L)).toDF("user_id", "ts", "px", "rid")
    val got = AsOf.asofJoinForward(left, right, Seq("user_id"), "ts", Seq("px"), col("rid"))
      .select(col("px")).collect()
    assert(got.head.getDouble(0) == 1.0)
  }

  test("tolerance nulls matches farther than the window (merge_asof tolerance)") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "near"),
      (1L, ts("2024-01-01 23:00:00"), "far")).toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 09:30:00"), 10.0, 1L))
      .toDF("user_id", "ts", "px", "rid")
    val got = AsOf.asofJoinBackward(left, right, Seq("user_id"), "ts", Seq("px"),
        col("rid"), toleranceMs = Some(3600L * 1000))
      .select(col("tag"), col("px"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("near").contains(10.0))
    assert(got("far").isEmpty)
  }

  test("matches the nearest right ROW, not the nearest non-null value (merge_asof row semantics)") {
    // The matched row's value may itself be null; an older non-null value
    // must NOT leak through — and the tolerance gate must be judged
    // against the matched row's time, not an older value-supplying row's.
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "l")).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Option(5.0), 1L),
      (1L, ts("2024-01-01 09:50:00"), None: Option[Double], 2L))
      .toDF("user_id", "ts", "px", "rid")
    val plain = AsOf.asofJoinBackward(left, right, Seq("user_id"), "ts", Seq("px"), col("rid"))
      .select("px").collect().head
    assert(plain.isNullAt(0)) // nearest row (09:50) wins and its px is null
    val toleranced = AsOf.asofJoinBackward(left, right, Seq("user_id"), "ts", Seq("px"),
        col("rid"), toleranceMs = Some(30L * 60 * 1000))
      .select("px").collect().head
    assert(toleranced.isNullAt(0)) // 09:50 within tolerance, but ITS value is null
  }

  test("reserved internal names are rejected, not silently clobbered") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("user_id", "ts", "_side")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1.0, 1L))
      .toDF("user_id", "ts", "px", "rid")
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoinBackward(left, right, Seq("user_id"), "ts", Seq("px"), col("rid"))
    }
    assert(e.getMessage.contains("_side"))
    val right2 = Seq((1L, ts("2024-01-01 09:00:00"), 1.0, 1L))
      .toDF("user_id", "ts", "_rts", "rid")
    intercept[IllegalArgumentException] {
      AsOf.asofJoinBackward(left.withColumnRenamed("_side", "tag"), right2,
        Seq("user_id"), "ts", Seq("_rts"), col("rid"))
    }
  }

  test("tiebreak: simultaneous right rows resolved by highest tiebreaker") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "l")).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0, 1L),
      (1L, ts("2024-01-01 10:00:00"), 2.0, 2L)).toDF("user_id", "ts", "px", "rid")
    val got = AsOf.asofJoinBackward(left, right, Seq("user_id"), "ts", Seq("px"), col("rid"))
      .select(col("px")).collect()
    assert(got.head.getDouble(0) == 2.0)
  }
}
