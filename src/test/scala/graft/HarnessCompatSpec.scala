package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Harness-compatibility tripwire (round-9 verdict ask #7): the driver's
  * correctness gate canonicalizes each result via pandas sort_values +
  * hash, which dies with `TypeError: unhashable type` on any top-level
  * array/map/struct cell — the exact failure that erred `vec_l2_normalize`
  * and `vec_mean_pool` in round 9 while their plans ran fine. This spec
  * builds every BATCH gate's DataFrame at sf0.001 (schema comes from
  * analysis; nothing is executed beyond what the builder itself runs) and
  * asserts the output schema is flat. Streaming gates run a full stream
  * inside their builder, so they are covered by the same assertion inside
  * [[Verify]] (which executes all of them anyway) rather than re-run here.
  */
class HarnessCompatSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // Batch-shaped gates that happen to live in the streaming registry
  // (no stream executes inside their builder) — swept here like any
  // batch gate.
  private val batchInStreamingRegistry = Set("interval_join_sessions")

  private val batchGates: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    QueriesCore.queries ++ QueriesText.queries ++ QueriesVector.queries ++
      QueriesMultimodal.queries ++
      QueriesStreaming.queries.view.filterKeys(batchInStreamingRegistry).toMap

  test("no batch gate emits a top-level array/map/struct column") {
    val offenders = batchGates.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val bad = fn(spark, dir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] => s"$name.${f.name}"
      }
      bad
    }
    assert(offenders.isEmpty,
      s"gates with pandas-unhashable top-level columns: ${offenders.mkString(", ")}")
  }

  test("every gate in the streaming registry is named streaming_/events_ or allowlisted") {
    // Keeps the batch/streaming split above honest: a batch-shaped gate
    // added to QueriesStreaming would silently escape the schema sweep
    // unless it is explicitly allowlisted into the batch sweep above.
    val stray = QueriesStreaming.queries.keys.filterNot(n =>
      n.startsWith("streaming_") || n.startsWith("events_") ||
        batchInStreamingRegistry(n))
    assert(stray.isEmpty, s"non-streaming-named gates in QueriesStreaming: ${stray.mkString(", ")}")
  }
}
