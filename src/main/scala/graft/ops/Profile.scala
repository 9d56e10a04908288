package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling — the data-quality reconnaissance pass a training-data
  * pipeline runs before trusting a new 100 TB drop: per-column null
  * counts, exact distinct counts, and min/max, all in ONE scan + one
  * shuffle (a single multi-aggregate; no per-column jobs).
  */
object Profile {

  /** One output row per profiled column: (column, n_rows, n_null,
    * n_distinct, min_str, max_str). Min/max are rendered to strings so
    * heterogeneous column types stack into one frame.
    *
    * Plan shape: a min/max whose AGGREGATION BUFFER is variable-width
    * (string/binary/precision>18 decimal) disqualifies HashAggregate, and
    * because the multi-column `countDistinct` rewrite puts every
    * aggregate into ONE operator over an Expand, a single string min/max
    * used to demote the whole 4x-expanded distinct pipeline to
    * SortAggregate with full sorts (measured 2.3x slower at sf0.1; at
    * 100 TB a full sort of 4x the table vs a hash probe is the
    * difference between hours and minutes). Var-width min/max therefore
    * runs in its OWN keyless aggregate (no keys -> no sort, and the scan
    * is pruned to just those columns) cross-joined back onto the
    * hash-friendly one-row result.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    def fixedWidth(dt: DataType): Boolean = dt match {
      case _: NumericType | BooleanType | DateType | TimestampType |
           TimestampNTZType => dt match {
        case d: DecimalType => d.precision <= 18
        case _ => true
      }
      case _ => false
    }
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct")) ++
      (if (fixedWidth(df.schema(c).dataType))
        Seq(min(col(c)).cast(StringType).as(s"${c}__min"),
          max(col(c)).cast(StringType).as(s"${c}__max"))
      else Nil)
    }
    val varAggs = cols.filterNot(c => fixedWidth(df.schema(c).dataType)).flatMap { c =>
      Seq(min(col(c)).cast(StringType).as(s"${c}__min"),
        max(col(c)).cast(StringType).as(s"${c}__max"))
    }
    val hashSide = df.agg(aggs.head, aggs.tail: _*)
    val wide =
      if (varAggs.isEmpty) hashSide
      else hashSide.crossJoin(df.agg(varAggs.head, varAggs.tail: _*))
    val perCol = cols.map { c =>
      struct(lit(c).as("column"), col(s"${c}__rows").as("n_rows"),
        col(s"${c}__nulls").as("n_null"), col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_str"), col(s"${c}__max").as("max_str"))
    }
    wide.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }

  /** Exact interpolated quantiles of `valueCol` per group — the
    * distribution-drift probe of a data-quality pass: one row per
    * (group, prob). Exact `percentile` sorts each group; on a 100 TB
    * column switch to `approx_percentile` (t-digest, map-side
    * combinable) and gate with a tolerance check instead of equality.
    */
  def quantiles(df: DataFrame, valueCol: String, groupCols: Seq[String],
                probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      "probs must be within [0, 1]")
    val pArr = array(probs.map(lit): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile(col(valueCol), pArr).as("qs"))
      .select(groupCols.map(col) :+ posexplode(col("qs")).as(Seq("pos", "q_value")): _*)
      .withColumn("prob", element_at(pArr, col("pos") + 1))
      .select(groupCols.map(col) ++ Seq(col("prob"), col("q_value")): _*)
  }

  /** Exact heavy hitters — every item whose count is ≥ num/den of the
    * table — without ever shuffling the full key space. The frequency
    * threshold is a RATIONAL (`count·den ≥ total·num` in integer math)
    * so the cut is bit-deterministic in any engine.
    *
    * Two passes, both sketch-sized on the wire:
    *  1. one scan → a Misra–Gries candidate sketch (≤ k counters per
    *     partition through the exchange — the key space's cardinality
    *     never prices the shuffle) plus the exact row count, in a single
    *     1-row aggregate. `k = slack·den/num` makes the sketch a proven
    *     candidate SUPERSET of the true heavy hitters (MG bound: any
    *     item with count ≥ total/(k+1) survives; the threshold is
    *     total·num/den ≥ slack·total/k ≫ total/(k+1)).
    *  2. one more scan, semi-joined against the ≤ k broadcast
    *     candidates → exact counts of candidates only (map-side combine
    *     bounds the exchange at k rows per partition), cut at the exact
    *     rational threshold (pre-resolved to ⌈total·num/den⌉ from the
    *     pass-1 total — one BigInt division, no per-row product).
    *
    * The sketch's own counter VALUES vary with partitioning (only its
    * superset guarantee is invariant), so they never reach the output:
    * the result is exactly `groupBy(item).count.filter(cnt·den ≥
    * total·num)` — deterministic, DuckDB-replicable, NULL group included
    * — at sketch-shuffle cost. Output: (item, cnt), the exact count.
    *
    * Thresholds finer than num/den = slack/[[MaxCounters]] are REFUSED
    * (require) rather than silently clamped: a clamped k would void the
    * Misra–Gries superset guarantee and true heavy hitters could go
    * missing from output this doc promises is exact. At that point the
    * candidate set is 10M+ counters per partition — no longer a sketch —
    * and the honest plan is the full `groupBy(item).count` shuffle.
    */
  def heavyHitters(df: DataFrame, itemCol: String, num: Long, den: Long,
                   slack: Int = 4): DataFrame = {
    require(num > 0 && den >= num, "need a frequency fraction 0 < num/den <= 1")
    require(slack >= 2, "slack < 2 voids the candidate-superset guarantee")
    // den/num FIRST (Long division), bound-check BEFORE multiplying by
    // slack — den/num*slack can overflow Long for extreme den.
    val kL = den / num
    require(kL <= MaxCounters / slack,
      s"threshold $num/$den needs $kL x slack=$slack MG counters > $MaxCounters; " +
      "a clamped sketch would silently void the candidate-superset " +
      "guarantee — coarsen the threshold or use the exact groupBy-count plan")
    val k = (kL * slack).toInt
    // Pass 1 is the one-row sketch state; pass 2 is the shared resolve
    // (which materializes the state EAGERLY — collecting the one row,
    // instead of a persist both pass-2 branches re-read, keeps nothing
    // cached in the session, and the candidate list had to reach the
    // driver anyway to be broadcast).
    hhResolve(df, hhSummarize(df, itemCol, k), itemCol, num, den)
  }

  /** Hard ceiling on Misra–Gries candidate counters per partition — past
    * this a "sketch" is corpus-sized state and [[heavyHitters]] refuses
    * the threshold instead of voiding its exactness guarantee.
    */
  val MaxCounters: Long = 10_000_000L

  // ---- incrementally-maintained heavy-hitter sketch state -----------------
  // The IncrementalAgg pattern applied to the Misra–Gries sketch: hot-item
  // profiling over a GROWING corpus at O(batch) per fold, never
  // O(history). State is ONE row (cand: ≤ k counters, total, nulls);
  // totals/nulls are exact (plain sums), only the counter estimates carry
  // sketch error. Error budget across folds: each re-sketch of replayed
  // counters decrements at most (fed weight)/(k+1), so after m folds the
  // cumulative undercount is ≤ m·n/(k+1) — size k ≥ m·slack·den/num to
  // keep the candidate-superset guarantee at threshold num/den (the
  // resolve step recounts exactly, so the guarantee is all that matters).

  /** One-row mergeable heavy-hitters state of a batch. */
  def hhSummarize(batch: DataFrame, itemCol: String, k: Int): DataFrame = {
    import graft.functions.HeavyHittersAggregate.misraGries
    val item =
      if (batch.schema(itemCol).dataType == StringType) col(itemCol)
      else col(itemCol).cast(LongType)
    // count(when(...)), not sum(when(...)): sum over an EMPTY batch is
    // NULL, and a null in the one-row state NPEs the resolve's getLong
    // (and poisons every later fold's sum) — count is never null.
    batch.agg(misraGries(item, k).as("cand"), count(lit(1)).as("total"),
      count(when(item.isNull, lit(1))).as("nulls"))
  }

  /** Fold a batch state into the running state — the mergeable-summaries
    * merge expressed as the aggregate itself: both sides' counters
    * (≤ 2k tiny rows) replay as WEIGHTED adds into a fresh k-bounded
    * sketch; exact totals add. Runs on the 1-row states only — cost is
    * O(k), independent of both batch and history size.
    */
  def hhMerge(state: DataFrame, batchSummary: DataFrame, k: Int): DataFrame =
    hhMergeAll(state.unionByName(batchSummary), k)

  /** Fold ANY number of one-row states in a single merge level: all
    * counters replay as weighted adds into one fresh k-bounded sketch,
    * so the cumulative undercount is ≤ 2n/(k+1) REGARDLESS of how many
    * states are folded (one per-wave term + one re-sketch term) — the
    * read-time fold of [[graft.streaming.EventStreams.heavyHittersSink]]
    * uses this, where the pairwise fold's m·n/(k+1) budget would force
    * k to grow with stream age.
    */
  def hhMergeAll(states: DataFrame, k: Int): DataFrame = {
    import graft.functions.HeavyHittersAggregate.misraGriesWeighted
    val counters = states.select(explode(col("cand")).as("c"))
      .select(col("c.item").as("item"), col("c.est").as("est"))
    // coalesce to 0: zero input states (or states written before the
    // count(when) fix) must fold to an exact-zero total, not a null that
    // NPEs the resolve.
    counters.agg(misraGriesWeighted(col("item"), col("est"), k).as("cand"))
      .crossJoin(broadcast(
        states.agg(coalesce(sum("total"), lit(0L)).as("total"),
          coalesce(sum("nulls"), lit(0L)).as("nulls"))))
      .select(col("cand"), col("total"), col("nulls"))
  }

  /** Exact heavy hitters read off a folded state: one recount scan of the
    * full corpus against the state's ≤ k broadcast candidates (counts
    * for items that became candidates late are unknowable from the
    * sketch alone — the recount is what keeps the output exact), cut at
    * ⌈total·num/den⌉ with the state's exact total. NULL group appended
    * from the state's exact null count, as in [[heavyHitters]].
    */
  def hhResolve(corpus: DataFrame, state: DataFrame, itemCol: String,
                num: Long, den: Long): DataFrame = {
    require(num > 0 && den >= num, "need a frequency fraction 0 < num/den <= 1")
    val stringKeyed = corpus.schema(itemCol).dataType == StringType
    val item = if (stringKeyed) col(itemCol) else col(itemCol).cast(LongType)
    val spark0 = corpus.sparkSession
    // A 0-row state (nothing ever summarized) means no heavy hitters —
    // return the empty result instead of head() throwing.
    val headOpt = state.select(col("cand"), col("total"), col("nulls")).take(1).headOption
    if (headOpt.isEmpty) {
      import spark0.implicits._
      // Branch-local toDF: unifying the two branches would LUB the tuple
      // to (Option[Any], Long), which has no encoder.
      return if (stringKeyed) Seq.empty[(Option[String], Long)].toDF("item", "cnt")
        else Seq.empty[(Option[Long], Long)].toDF("item", "cnt")
    }
    val head = headOpt.get
    val total = head.getLong(1)
    val nullCnt = head.getLong(2)
    val cntMin = ((BigInt(total) * num + den - 1) / den).toLong
    val spark = corpus.sparkSession
    import spark.implicits._
    val candItems = head.getSeq[org.apache.spark.sql.Row](0)
    val candDf =
      if (stringKeyed) candItems.map(_.getString(0)).toDF("_hh_cand")
      else candItems.map(_.getLong(0)).toDF("_hh_cand")
    val nonNull = corpus
      .join(broadcast(candDf), item === col("_hh_cand"), "left_semi")
      .groupBy(item.as("item"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= cntMin)
      .select(col("item"), col("cnt"))
    if (nullCnt > 0 && BigInt(nullCnt) * den >= BigInt(total) * num) {
      val nullRow =
        if (stringKeyed) Seq((Option.empty[String], nullCnt)).toDF("item", "cnt")
        else Seq((Option.empty[Long], nullCnt)).toDF("item", "cnt")
      nonNull.unionByName(nullRow)
    } else nonNull
  }
}
