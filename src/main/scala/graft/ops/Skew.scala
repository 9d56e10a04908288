package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins (SURVEY.md §4 / SCALE.md): AQE
  * skew-join splitting is the first line of defense; explicit salting is
  * the deterministic fallback for the pathological case AQE can't fix —
  * one key so hot that a single task would still own it after splitting
  * (e.g. a power-law user_id in a fact⋈fact join).
  *
  * Shape: the probe side gets a deterministic salt in [0, buckets) derived
  * by hashing its whole row (xxhash64 — stable across retries, unlike
  * rand()); the build side is replicated `buckets` times via explode. The
  * join key becomes (key, salt), spreading each hot key over `buckets`
  * tasks. Cost: build side shuffles buckets x its size — use only when
  * build ≪ probe.
  */
object Skew {

  /** Equi-join `probe ⋈ build` on `keys` with `buckets`-way salting.
    * Semantically identical to `probe.join(build, keys, joinType)` for
    * 1:N joins (each probe row still meets every matching build row
    * exactly once, in its salt slice). joinType: "inner" or "left".
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin replicates the build side; only inner/left keep join semantics (got $joinType)")
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(buckets)).cast("int"))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }
}
