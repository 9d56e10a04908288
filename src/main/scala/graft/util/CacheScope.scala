package graft.util

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.DataFrame

/** Tracks persisted intermediates so composed pipelines can release them
  * deterministically. The dedup/corpus flows persist multiply-referenced
  * indexes by default; in a long-lived session (a service, or the
  * Verify/Bench loops) untracked persists accumulate until executor
  * storage evicts under pressure. Callers that run many pipeline
  * invocations pass a scope and `close()` it after the terminal action:
  *
  * {{{
  * val scope = new CacheScope
  * try Dedup.ngramJaccardPairs(docs, "id", "text", cache = scope.persist).count()
  * finally scope.close()
  * }}}
  *
  * The default `CacheScope.untracked` preserves the old behavior (persist
  * with no handle) for one-shot jobs where session teardown reclaims
  * everything anyway.
  */
final class CacheScope {
  private val frames = ArrayBuffer.empty[DataFrame]

  /** Persist and track `df`; released by [[close]]. */
  def persist(df: DataFrame): DataFrame = synchronized {
    val p = df.persist()
    frames += p
    p
  }

  /** Unpersist every tracked frame (non-blocking) and forget them. */
  def close(): Unit = synchronized {
    frames.foreach(_.unpersist(false))
    frames.clear()
  }
}

object CacheScope {
  /** Persist with no tracking — the one-shot-job default. */
  val untracked: DataFrame => DataFrame = (df: DataFrame) => df.persist()

  /** Persist AND truncate lineage (`localCheckpoint`) — for intermediates
    * referenced by several downstream branches whose LOGICAL plan would
    * otherwise carry a copy of the whole upstream tree per reference
    * (optimization guide §3.3/§5: materialise to truncate the plan; a
    * plain persist dedups EXECUTION but not per-action Catalyst
    * re-analysis, measured as ~25% of `corpus_clean`'s wall with its
    * ~1 MB formatted plan). Blocks are reclaimed by the ContextCleaner
    * when references expire, and Bench's between-rep cleanup unpersists
    * them like any tracked persist. `SPARK_GRAFT_NO_PLANCUT` restores
    * the persist-only shape — the A/B harness for pricing the cut.
    */
  val truncate: DataFrame => DataFrame = (df: DataFrame) =>
    // The system property is the in-JVM escape (plan-shape tests inspect
    // the composed, un-truncated plan); the env var is the A/B harness.
    if (sys.env.contains("SPARK_GRAFT_NO_PLANCUT") ||
        sys.props.contains("spark.graft.noPlanCut")) df.persist()
    else df.localCheckpoint()

  /** No caching at all — for callers managing their own persistence. */
  val none: DataFrame => DataFrame = identity
}
