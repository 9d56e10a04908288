package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import EventStreams.{Event, Session}

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def event(id: Long, t: String, user: Long, typ: String, v: Double) =
    Event(id, ts(t), user, typ, v)

  test("streaming tumbling agg matches the batch twin on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val events = Seq(
      event(1, "2024-01-01 10:05:00", 1, "click", 1.0),
      event(2, "2024-01-01 10:55:00", 1, "click", 2.0),
      event(3, "2024-01-01 11:05:00", 2, "view", 3.0),
      event(4, "2024-01-01 11:20:00", 1, "click", 4.0))
    input.addData(events: _*)

    val agg = EventStreams.tumblingAgg(input.toDF())
    val q = agg.writeStream.format("memory").queryName("tumbling_test")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("tumbling_test")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        BigDecimal(r.getDecimal(3)))).toSet
    val batch = EventStreams.tumblingAgg(events.toDF())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        BigDecimal(r.getDecimal(3)))).toSet
    assert(streamed == batch)
    assert(streamed == Set(
      (ts("2024-01-01 10:00:00"), "click", 2L, BigDecimal("3.000000")),
      (ts("2024-01-01 11:00:00"), "click", 1L, BigDecimal("4.000000")),
      (ts("2024-01-01 11:00:00"), "view", 1L, BigDecimal("3.000000"))))
  }

  test("sessionize: gap splits sessions; state emits on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // user 1: two events 1 min apart (one session), then a 2-hour gap, one more
    input.addData(
      event(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      event(2, "2024-01-01 10:01:00", 1, "click", 2.0),
      event(3, "2024-01-01 12:30:00", 1, "click", 4.0))

    val sessions = EventStreams.sessionize(input.toDS(), gapMs = 30 * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("session_test")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()

    // The first session closes when event 3 arrives past the gap; the
    // second stays open in state (no timeout fired in AvailableNow-style run).
    val got = spark.table("session_test").as[Session].collect()
    assert(got.length == 1)
    assert(got.head.user_id == 1L)
    assert(got.head.n_events == 2L)
    assert(got.head.total_value == 3.0)
    assert(got.head.session_start == ts("2024-01-01 10:00:00"))
    assert(got.head.session_end == ts("2024-01-01 10:01:00"))
  }

  test("dedupStream: duplicate keys within the watermark emit once") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      event(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      event(1, "2024-01-01 10:00:00", 1, "click", 1.0), // exact duplicate
      event(2, "2024-01-01 10:01:00", 1, "click", 2.0))
    val q = EventStreams.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dedup_stream_test")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_stream_test").collect()
    assert(got.length == 2)
  }

  test("clickPurchaseJoin: interval-bounded stream-stream join") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      event(1, "2024-01-01 09:30:00", 1, "purchase", 50.0), // within 1h of click
      event(2, "2024-01-01 08:00:00", 1, "purchase", 99.0), // too old
      event(3, "2024-01-01 10:00:00", 1, "click", 0.0),
      event(4, "2024-01-01 10:00:00", 2, "click", 0.0))     // no purchase
    val q = EventStreams.clickPurchaseJoin(input.toDF())
      .writeStream.format("memory").queryName("cpjoin_test")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cpjoin_test").collect()
      .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id"))).toSet
    assert(got == Set((3L, 1L)))
  }

  test("mergeSink: micro-batches merge incrementally with last-write-wins") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val statePath = Files.createTempDirectory("graft_stream_state").toString + "/state"
    val ckpt = Files.createTempDirectory("graft_ckpt").toString

    // AvailableNow runs drain what's queued then stop — run the sink once
    // per micro-batch wave, resuming from the same checkpoint (the
    // production incremental pattern).
    input.addData(
      event(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      event(2, "2024-01-01 10:05:00", 1, "click", 2.0), // beats event 1 (later ts)
      event(3, "2024-01-01 10:00:00", 2, "view", 9.0))
    val q1 = EventStreams.mergeSink(input.toDF(), statePath,
      Seq("user_id", "event_type"), Seq(col("ts").desc, col("event_id").desc), ckpt)
    q1.awaitTermination(60000)

    input.addData(
      event(4, "2024-01-01 11:00:00", 1, "click", 7.0)) // beats event 2
    val q2 = EventStreams.mergeSink(input.toDF(), statePath,
      Seq("user_id", "event_type"), Seq(col("ts").desc, col("event_id").desc), ckpt)
    q2.awaitTermination(60000)

    val state = spark.read.parquet(statePath)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        r.getAs[Double]("value")).toMap
    assert(state == Map((1L, "click") -> 7.0, (2L, "view") -> 9.0))
  }

  test("wavedEventsStream delivers one time-ordered micro-batch per wave") {
    val st = graft.io.Tables.wavedEventsStream(spark, "/root/testdata/sf0.001", 3)
    val q = st.writeStream.format("memory").queryName("waves_test")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length == 3, "each wave must arrive as its own micro-batch")
    val total = graft.io.Tables.events(spark, "/root/testdata/sf0.001").count()
    assert(spark.table("waves_test").count() == total)
    // Waves are time-ordered: sessions spanning batches stay correct, so
    // the multi-wave sessionize must equal the single-wave (live) result —
    // the cross-micro-batch state contract graded by the *_waves gates.
    import org.apache.spark.sql.functions.col
    val live = graft.Queries.queries("streaming_sessionize_live")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSet
    val waves = graft.Queries.queries("streaming_sessionize_waves")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSet
    assert(waves == live)
  }
}
