package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Tables
import graft.ops.{AsOf, BloomPrune, Merge, Normalize, Quality, Recall, Reshape, Summary, Windows}
import graft.text.{Dedup, TextAnalysis}
import graft.vector.Similarity
import graft.multimodal.BinaryOps

/** The driver oracle contract (SURVEY.md §7.2): every implemented operator
  * from SURVEY.md §2 — plus the training-data-pipeline extensions (dedup,
  * similarity, text analysis, multimodal) — expressed over the TPC-H-ish
  * driver testdata, with a DuckDB-runnable ANSI SQL twin where the
  * semantics are SQL-expressible.
  *
  * Determinism rules (every query must hash-match an independent engine):
  *  - monetary aggregates go through DECIMAL (order-independent exact sums),
  *    never raw double accumulation;
  *  - every window/top-k has a total order (unique tiebreaker);
  *  - derived doubles are either pure per-row arithmetic on identical
  *    inputs (bit-equal in both engines) or rounded to 6 places.
  */
object Queries {

  /** The full gate contract: the five family registries merged. Names are
    * unique across families (asserted) — a collision would silently drop
    * a gate from the driver's denominator. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val fams = Seq(
      QueriesCore.queries, QueriesText.queries, QueriesVector.queries,
      QueriesStreaming.queries, QueriesMultimodal.queries)
    val merged = fams.reduce(_ ++ _)
    require(merged.size == fams.map(_.size).sum,
      "duplicate gate name across family registries")
    merged
  }

  val oracleSql: Map[String, String] = {
    val fams = Seq(
      QueriesCore.oracleSql, QueriesText.oracleSql, QueriesVector.oracleSql,
      QueriesStreaming.oracleSql, QueriesMultimodal.oracleSql)
    val merged = fams.reduce(_ ++ _)
    require(merged.size == fams.map(_.size).sum,
      "duplicate oracle name across family registries")
    require(merged.keySet.subsetOf(queries.keySet),
      "oracle without a gate: " + (merged.keySet -- queries.keySet))
    merged
  }
}
