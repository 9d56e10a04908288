package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def randomized(seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val left = (1 to 500).map(i => (i.toLong, (i % 7).toLong, rnd.nextInt(100000).toLong))
      .toDF("lid", "key", "t")
    val right = (1 to 60).map { i =>
      val s = rnd.nextInt(100000).toLong
      (i.toLong, (i % 7).toLong, s, s + rnd.nextInt(5000).toLong)
    }.toDF("rid", "key", "s", "e")
    (left, right)
  }

  test("intervalJoin == naive theta join on randomized data, across bin widths") {
    val (left, right) = randomized(42L)
    val naive = left.join(right,
        left("key") === right("key") && col("t") >= col("s") && col("t") <= col("e"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 100L, 4096L, 1000000L)) {
      val got = RangeJoin.intervalJoin(left, right, Seq("key"), "t", "s", "e", w)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(got == naive, s"binWidth=$w")
    }
  }

  test("inclusive bounds, no dedup artifacts, timestamps bin in micros") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 11:00:00")),
      (3L, 1L, ts("2024-01-01 11:00:00.000001")),
      (4L, 2L, ts("2024-01-01 10:30:00"))).toDF("lid", "key", "t")
    val right = Seq((10L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("rid", "key", "s", "e")
    val got = RangeJoin.intervalJoin(left, right, Seq("key"), "t", "s", "e",
        binWidth = 15L * 60 * 1000000L)
      .select("lid").as[Long].collect().sorted
    // Both endpoints inclusive; one micro past the end excluded; key 2 never joins.
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("an interval spanning many bins still matches each left row exactly once") {
    val left = Seq((1L, 1L, 500L)).toDF("lid", "key", "t")
    val right = Seq((10L, 1L, 0L, 10000L)).toDF("rid", "key", "s", "e")
    val got = RangeJoin.intervalJoin(left, right, Seq("key"), "t", "s", "e", 10L)
    assert(got.count() == 1L)
  }

  test("reserved _bin names rejected") {
    val l = Seq((1L, 1L, 1L)).toDF("_bin", "key", "t")
    val r = Seq((1L, 1L, 0L, 2L)).toDF("rid", "key", "s", "e")
    intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(l, r, Seq("key"), "t", "s", "e", 10L)
    }
  }

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
}
