package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for LLM pretraining: documents are (conceptually)
  * concatenated in a deterministic order and chunked into fixed-length
  * training sequences of `maxTokens`; this operator assigns each document
  * its chunk span WITHOUT materializing the concatenation — the
  * downstream tokenizer stage uses (shard, start_chunk, offset) to place
  * each document's tokens.
  *
  * Scale shape: a single GLOBAL concatenation order would be a
  * one-partition running sum (the window-without-partition anti-pattern).
  * Instead documents are hash-sharded and packed WITHIN each shard —
  * `nShards` independent running sums, one shuffle on the shard key,
  * each shard's chunk ids disjoint by construction ((shard, chunk) is
  * the global id). Packing quality is unaffected: concat-and-chunk
  * wastes no tokens regardless of order, and shard-local ordering by
  * doc id keeps the assignment reproducible under retries and
  * repartitioning (same argument as hash-based sampling).
  */
object Packing {

  /** Assign each document a (shard, start_chunk, end_chunk, start_offset)
    * span. `tokenCount` is the per-row token count expression (nulls are
    * treated as 0); rows are ordered by `idCol` within each shard, so the
    * output is deterministic. Zero-token documents get
    * end_chunk = start_chunk (they occupy no tokens but keep a defined
    * position). `hashFn` defaults to xxhash64; pass
    * [[graft.functions.Hashes.Md5Hash60]] for cross-engine replication.
    */
  def chunkAssignments(docs: DataFrame, idCol: String, tokenCount: Column,
                       maxTokens: Long, nShards: Int,
                       hashFn: Column => Column = graft.functions.Hashes.XxHash64): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(nShards > 0, "nShards must be positive")
    val reserved = Seq("_tok", "_cum", "shard")
    val clash = docs.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"chunkAssignments reserves ${reserved.mkString(", ")}; rename ${clash.mkString(", ")}")
    // Order by (id, token count): ids SHOULD be unique, but if an
    // upstream union duplicates a doc the secondary key keeps the order
    // total whenever the duplicates differ, and exact duplicates (same
    // id, same count) are interchangeable — the output multiset is
    // identical either way. Without the tiebreaker, duplicate ids would
    // make offsets physical-order dependent (retry-unstable).
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol), col("_tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", pmod(hashFn(col(idCol).cast("string")), lit(nShards.toLong)))
      .withColumn("_tok", coalesce(tokenCount.cast(LongType), lit(0L)))
      .withColumn("_cum", sum(col("_tok")).over(w))
      .select(col(idCol), col("shard"), col("_tok").as("n_tokens"),
        (col("_cum") - col("_tok")).as("start_offset"),
        floor((col("_cum") - col("_tok")) / lit(maxTokens)).as("start_chunk"),
        when(col("_tok") === 0,
          floor((col("_cum") - col("_tok")) / lit(maxTokens)))
          .otherwise(floor((col("_cum") - 1) / lit(maxTokens)))
          .as("end_chunk"))
  }
}
