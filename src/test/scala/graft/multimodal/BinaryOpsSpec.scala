package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BinaryOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "a" * 100),  // 3 full 32-byte frames + remainder
    (1L, "b" * 31),   // shorter than one frame -> no rows
    (2L, "c" * 64))   // exactly 2 frames
    .toDF("doc_id", "text")
    .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  test("frame sampling: full frames only, deterministic hashes") {
    val frames = BinaryOps.sampleFrames(docs, "doc_id", "payload", frameBytes = 32)
    val byDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc == Map(0L -> 3L, 2L -> 2L)) // doc 1 yields nothing
    // identical frame content -> identical hash
    val hashes = frames.where(col("doc_id") === 0L).select("frame_hash")
      .collect().map(_.getString(0)).toSet
    assert(hashes.size == 1) // all-'a' frames hash identically
  }

  test("decode stub: deterministic metadata, schema as declared") {
    val meta = BinaryOps.decodeImageMeta(spark, docs, "doc_id", "payload")
    assert(meta.schema == BinaryOps.imageMetaSchema)
    val rows = meta.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3), r.getLong(4))).toMap
    assert(rows(0L)._4 == 100L)
    // re-run produces identical output (determinism for the oracle)
    val rows2 = BinaryOps.decodeImageMeta(spark, docs, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3), r.getLong(4))).toMap
    assert(rows == rows2)
  }
}
