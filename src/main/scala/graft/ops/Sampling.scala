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
    *
    * Null keys are coalesced to a fixed sentinel BEFORE hashing, so every
    * null-key row lands in one deterministic bucket under EITHER hash
    * config. Without this the two configs diverge silently: md5(null) is
    * null, so a null bucket falls through hashSplit's when-chain into the
    * last split and is dropped outright by stratifiedHashSample's filter,
    * while xxhash64 maps nulls to its seed value's bucket.
    */
  private val NullKeySentinel = "__graft:null-key__"
  def hashBucket(key: Column,
                 hashFn: Column => Column = graft.functions.Hashes.XxHash64): Column =
    pmod(hashFn(coalesce(key.cast(StringType), lit(NullKeySentinel))), lit(Buckets))

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

  /** Deterministic corpus MIXING to a target composition: given per-group
    * weights (e.g. web 0.6, books 0.3, code 0.1), keep the LARGEST
    * possible sample whose group proportions match the weights. The
    * binding group (smallest n_g/w_g) is kept whole; every other group is
    * down-sampled by hash threshold to its share — one bounded group-count
    * aggregate (|groups| rows to the driver, like the touched-partition
    * list in Merge) and then a pure scan-side filter, retry-stable and
    * cross-engine replicable under the md5 hash. Groups outside `targets`
    * are dropped.
    */
  def mixtureSample(df: DataFrame, keyCol: String, groupCol: String,
                    targets: Seq[(String, Double)],
                    hashFn: Column => Column = graft.functions.Hashes.XxHash64): DataFrame = {
    require(targets.nonEmpty, "need at least one target group")
    require(targets.map(_._1).distinct.size == targets.size, "duplicate target group")
    require(targets.forall(_._2 > 0), "target weights must be positive")
    require(math.abs(targets.map(_._2).sum - 1.0) < 1e-9, "target weights must sum to 1")
    val names = targets.map(_._1)
    val counts = df.where(col(groupCol).isin(names: _*))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = names.filterNot(counts.contains)
    require(missing.isEmpty,
      s"target groups absent from the data: ${missing.mkString(", ")}")
    // Largest achievable mixture size: each group caps N at n_g / w_g.
    val ratios = targets.map { case (g, w) => g -> counts(g) / w }.toMap
    val nT = ratios.values.min
    // Same literal double arithmetic ORDER as the SQL replica:
    // ((w * nT) / n) * Buckets, floored — EXCEPT the binding group(s),
    // whose threshold is mathematically exactly Buckets but whose
    // floating-point round trip (w * (n/w) / n) can land a hair below
    // 1.0 and floor to Buckets-1, silently dropping ~1/Buckets of the
    // group the contract says is kept whole. Pinned to Buckets instead;
    // the binding test (n/w == nT) is an exact-double compare of the
    // very value nT was min'd from, so it is deterministic and the SQL
    // replica mirrors it literally.
    val thrExpr = targets.foldRight(lit(0L): Column) { case ((g, w), rest) =>
      val t = if (ratios(g) == nT) Buckets
              else math.floor(w * nT / counts(g) * Buckets).toLong
      when(col(groupCol) === g, lit(t)).otherwise(rest)
    }
    df.where(col(groupCol).isin(names: _*))
      .where(hashBucket(col(keyCol), hashFn) < thrExpr)
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
