package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling / split assignment for training-data pipelines.
  *
  * At 100 TB, `rand()`-based sampling is a correctness bug, not a style
  * choice: task retries and stage re-executions re-draw the randomness, so
  * a lost executor silently changes the sample; and the draw is not
  * reproducible across runs, so train/val/test membership drifts between
  * pipeline versions. Hash-based assignment — bucket = hash(key) mod N —
  * is stable under retries, repartitioning, engine version, and cluster
  * size, and any row's membership can be audited after the fact.
  *
  * All functions are pure per-row expressions: no shuffle, no state.
  */
object Sampling {

  private val Buckets = 10000L

  /** Stable per-key bucket in [0, 10000): the basis for splits/sampling.
    * `hashFn` defaults to xxhash64; pass
    * [[graft.functions.Hashes.Md5Hash60]] for a cross-engine-replicable
    * assignment.
    */
  def hashBucket(key: Column,
                 hashFn: Column => Column = graft.functions.Hashes.XxHash64): Column =
    pmod(hashFn(key.cast(StringType)), lit(Buckets))

  /** Assign each row to a named split by cumulative weight over its hash
    * bucket (e.g. `Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01)`).
    * Weights must sum to ~1; the last split absorbs rounding remainder so
    * every bucket maps to exactly one split.
    */
  def hashSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
                splitCol: String = "split",
                hashFn: Column => Column = graft.functions.Hashes.XxHash64): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split weights must sum to 1")
    val b = hashBucket(col(keyCol), hashFn)
    val bounds = splits.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w * Buckets)
    }.tail
    val expr = splits.zip(bounds).init.foldRight(lit(splits.last._1): Column) {
      case (((name, _), upper), rest) => when(b < upper, name).otherwise(rest)
    }
    df.withColumn(splitCol, expr)
  }

  /** Keep each row with its stratum's rate, deterministically: row survives
    * iff its hash bucket falls below rate*10000. Per-source mixing weights
    * for corpus blending (e.g. web 10%, books 100%) in ONE scan-side
    * filter — no shuffle, no sampleBy randomness.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           rates: Map[String, Double], defaultRate: Double,
                           hashFn: Column => Column = graft.functions.Hashes.XxHash64): DataFrame = {
    val b = hashBucket(col(keyCol), hashFn)
    // Thresholds resolve to integer literals at PLAN time (half-up
    // rounding): `rate*10000` truncated at runtime would silently
    // under-sample non-round rates, and an independent replica rounding
    // instead of truncating would disagree on one bucket.
    def threshold(r: Double): Long = {
      require(r >= 0 && r <= 1, s"rate must be within [0, 1], got $r")
      math.round(r * Buckets)
    }
    val thrExpr = rates.foldRight(lit(threshold(defaultRate)): Column) {
      case ((k, r), rest) => when(col(strataCol) === k, lit(threshold(r))).otherwise(rest)
    }
    df.where(b < thrExpr)
  }
}
