package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction: build a compact Bloom filter over the
  * dimension's join keys, filter the fact SCAN-side with it, then run the
  * exact join. The result is IDENTICAL to the plain join — Bloom false
  * positives survive the pruning filter but are eliminated by the join
  * itself — while the rows entering the fact-side shuffle drop from
  * |fact| to |matching ∪ false-positives|.
  *
  * When this wins at 100 TB: the dimension is too big to broadcast-join
  * (so Spark picks a shuffle join, moving the ENTIRE fact table), but its
  * Bloom digest is a few MB (8 bits/key at 1% fpp) and ships to every
  * executor as a literal. This is the manual form of Spark's own
  * runtime-filter rewrite (`spark.sql.optimizer.runtime.bloomFilter`,
  * which only fires when a selective filter sits on the creation side);
  * here the caller states the intent directly and the pruning filter is
  * guaranteed, not heuristic. Reuses Spark's codegen'd
  * `BloomFilterAggregate` / `BloomFilterMightContain` expressions — the
  * same sketch both tiers of the engine would use — rather than a
  * hand-rolled bitset.
  *
  * The bloom build is ONE bounded driver action (the serialized filter,
  * `numBits/8` bytes) — the same driver-size class as an AQE stats
  * exchange, not a data collect.
  */
object BloomPrune {

  /** Serialized Bloom filter over `xxhash64(dim[keyCol])`; null when the
    * dimension is empty (every probe then prunes, matching the empty
    * join). Size the filter from the expected distinct-key count:
    * `numBits ≈ -n·ln(fpp)/ln(2)²` — the 8M default gives ~1% fpp at 1M
    * keys for a 1 MB digest.
    */
  def buildBloom(dim: DataFrame, keyCol: String,
                 expectedItems: Long = 1000000L,
                 numBits: Long = 8388608L): Option[Array[Byte]] = {
    val agg = GraftShims.column(
      new BloomFilterAggregate(
        GraftShims.expression(xxhash64(col(keyCol))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    val row = dim.agg(agg.as("bf")).head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }

  /** Might-contain probe of a serialized filter from [[buildBloom]] —
    * scan-side, codegen'd, pushable below the join exchange.
    */
  def mightContain(bloom: Option[Array[Byte]], key: Column): Column =
    bloom match {
      case Some(b) =>
        GraftShims.column(BloomFilterMightContain(
          Literal(b, BinaryType), GraftShims.expression(xxhash64(key))))
      case None => lit(false)
    }

  /** The composed operator: bloom-prune the fact side, then exact inner
    * join. Result == `fact JOIN dim` exactly; only the exchange volume
    * changes. `expectedItems` should be the dimension's approximate
    * distinct-key count.
    */
  def bloomPrunedJoin(fact: DataFrame, factKey: String,
                      dim: DataFrame, dimKey: String,
                      expectedItems: Long = 1000000L,
                      numBits: Long = 8388608L): DataFrame = {
    val bloom = buildBloom(dim, dimKey, expectedItems, numBits)
    fact.where(mightContain(bloom, col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
