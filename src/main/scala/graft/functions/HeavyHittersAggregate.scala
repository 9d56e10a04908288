package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra–Gries heavy-hitters sketch as a map-side-combinable aggregate —
  * the frequent-items member of the sketch family (HLL approx-distinct,
  * HDR quantiles) a 100 TB profiling pass needs.
  *
  * Why not `groupBy(item).count`: exact counting shuffles EVERY distinct
  * key — at web scale the key space (tokens, hosts, user ids) is itself
  * corpus-sized. The sketch keeps at most `k` counters per partition, so
  * the exchange carries O(k × partitions) rows regardless of
  * cardinality, and the classic mergeable-summaries bound survives the
  * merge tree: for stream length n, every estimate satisfies
  * `true − n/(k+1) ≤ est ≤ true`. Hence any item with true count
  * ≥ n/(k+1) is GUARANTEED present in the sketch — the sketch is a
  * candidate SUPERSET for any frequency threshold f once k + 1 > 1/f.
  *
  * The sketch's exact counter values depend on partitioning (the bound
  * does not), so gate-facing results never expose them directly:
  * [[graft.ops.Profile.heavyHitters]] uses the sketch as pass-1
  * candidates and re-counts them exactly in pass 2 — deterministic
  * output, sketch-sized shuffles.
  */
object HeavyHittersAggregate {

  /** Bounded counter map: at most k items. Decrement-all on overflow is
    * amortized O(1) per element (every decrement round is paid for by
    * the insertions it cancels).
    */
  final class MgBuffer(val k: Int) {
    val counts = new java.util.HashMap[Long, Long](k * 2)

    def add(item: Long, by: Long): Unit = {
      val cur = counts.get(item)
      if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + by)
      else if (counts.size < k) counts.put(item, by)
      else {
        // Decrement every counter by the new item's weight (classic MG
        // generalized to weighted adds); drop non-positive counters. The
        // new item is "absorbed" by the same decrement.
        val min = math.min(by, minCount())
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - min
          if (nv <= 0) it.remove() else e.setValue(nv)
        }
        val rem = by - min
        if (rem > 0 && counts.size < k) counts.put(item, rem)
      }
    }

    private def minCount(): Long = {
      var m = Long.MaxValue
      val it = counts.values().iterator()
      while (it.hasNext) { val v = it.next(); if (v < m) m = v }
      if (m == Long.MaxValue) 0L else m
    }

    /** Mergeable-summaries merge: sum counters, then if over k keep the
      * top k after subtracting the (k+1)-th largest count (errors add).
      */
    def merge(other: MgBuffer): Unit = {
      val it = other.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = counts.get(e.getKey)
        counts.put(e.getKey, cur + e.getValue)
      }
      if (counts.size > k) {
        val vals = new Array[Long](counts.size)
        var i = 0
        val vit = counts.values().iterator()
        while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - k - 1) // (k+1)-th largest
        val eit = counts.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          val nv = e.getValue - cut
          if (nv <= 0) eit.remove() else e.setValue(nv)
        }
      }
    }
  }

  /** misra_gries(item long, k) -> array<struct<item long, est long>>,
    * ordered est desc then item asc (a deterministic ORDER for whatever
    * counter set the partitioning produced; the set itself is
    * partitioning-dependent — see the object doc for why that is fine).
    */
  case class MisraGries(itemExpr: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[MgBuffer] {

    require(k > 0, "k must be positive")

    override def children: Seq[Expression] = Seq(itemExpr)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("item", LongType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      itemExpr.dataType match {
        case LongType | IntegerType | ShortType | ByteType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_misra_gries requires an integral item column, got $other")
      }

    override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

    override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
      val v = itemExpr.eval(input)
      if (v != null) buffer.add(v.asInstanceOf[Number].longValue(), 1L)
      buffer
    }

    override def merge(buffer: MgBuffer, other: MgBuffer): MgBuffer = {
      buffer.merge(other)
      buffer
    }

    override def eval(buffer: MgBuffer): Any = {
      val entries = new Array[(Long, Long)](buffer.counts.size)
      var i = 0
      val it = buffer.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        entries(i) = (e.getKey, e.getValue); i += 1
      }
      val sorted = entries.sortBy { case (item, est) => (-est, item) }
      new GenericArrayData(sorted.map { case (item, est) =>
        InternalRow(item, est): Any
      })
    }

    override def serialize(buffer: MgBuffer): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + buffer.counts.size * 16)
      bb.putInt(buffer.k).putInt(buffer.counts.size)
      val it = buffer.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        bb.putLong(e.getKey).putLong(e.getValue)
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): MgBuffer = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new MgBuffer(bb.getInt)
      val n = bb.getInt
      var i = 0
      while (i < n) { buf.counts.put(bb.getLong, bb.getLong); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
      copy(itemExpr = newChildren(0))
    override def prettyName: String = "graft_misra_gries"
  }

  /** Column form: the ≤ k surviving (item, est) counters. */
  def misraGries(item: Column, k: Int): Column =
    GraftShims.column(
      MisraGries(GraftShims.expression(item), k).toAggregateExpression())
}
