package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("chunk spans tile the shard stream exactly: contiguous, gap-free, budget-aligned") {
    val docs = (1L to 200L).map(i => (i, (i % 37 + 1).toInt)).toDF("id", "n")
    val got = Packing.chunkAssignments(docs, "id", col("n"), maxTokens = 64, nShards = 4)
      .orderBy("shard", "id").collect()
    // Per shard: offsets are a gap-free running sum and chunk math matches.
    got.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      var expectedOffset = 0L
      rows.foreach { r =>
        val (tok, off, sc, ec) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        assert(off == expectedOffset, s"gap at $r")
        assert(sc == off / 64)
        assert(ec == (if (tok == 0) sc else (off + tok - 1) / 64))
        expectedOffset += tok
      }
    }
  }

  test("zero/null token counts keep a defined position; no tokens consumed") {
    val docs = Seq((1L, Some(10)), (2L, None), (3L, Some(0)), (4L, Some(5)))
      .toDF("id", "n")
    val got = Packing.chunkAssignments(docs, "id", col("n"), maxTokens = 8, nShards = 1)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got(0) == ((1L, 10L, 0L, 0L, 1L)))  // spans chunks 0-1
    assert(got(1) == ((2L, 0L, 10L, 1L, 1L)))  // null -> 0 tokens at offset 10
    assert(got(2) == ((3L, 0L, 10L, 1L, 1L)))
    assert(got(3) == ((4L, 5L, 10L, 1L, 1L)))  // 10..14 inside chunk 1
  }

  test("assignment is stable under repartitioning (retry-safe)") {
    val docs = (1L to 500L).map(i => (i, 7)).toDF("id", "n")
    val a = Packing.chunkAssignments(docs, "id", col("n"), 64, 8)
      .orderBy("id").collect().toSeq
    val b = Packing.chunkAssignments(docs.repartition(13), "id", col("n"), 64, 8)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("duplicate ids: output multiset is physical-order independent") {
    // Same id twice with DIFFERENT counts: the (id, tok) tiebreak makes
    // the order total. Same id+count: rows are interchangeable, so the
    // output multiset is identical either way.
    val rows = Seq((5L, 10), (5L, 20), (9L, 7), (9L, 7))
    val a = Packing.chunkAssignments(rows.toDF("id", "n"), "id", col("n"), 16, 1)
      .collect().map(_.toSeq).toSet
    val b = Packing.chunkAssignments(rows.reverse.toDF("id", "n").repartition(3),
        "id", col("n"), 16, 1)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("reserved names rejected") {
    intercept[IllegalArgumentException] {
      Packing.chunkAssignments(Seq((1L, 1)).toDF("shard", "n"), "shard", col("n"), 8, 2)
    }
  }
}
