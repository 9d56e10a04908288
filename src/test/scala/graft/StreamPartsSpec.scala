package graft

import java.nio.file.{Files, Paths}

/** Pins the streaming shuffle-partition sizing rule
  * (QueriesShared.streamParts / sizeStreamParts:
  * `max(8, min(cores, bytes / 4 MB))`). The arithmetic is pinned as a
  * pure function at the production widths; the listing path is pinned
  * with a sparse-file fixture (the rule only LISTS the table directory,
  * so apparent length is what sizing sees).
  */
class StreamPartsSpec extends SparkSpec {

  test("sizing arithmetic at the production widths") {
    val mb = 1L << 20
    // sf0.1 events (2 MB) and sf1 events (16 MB): the small-SF floor.
    assert(QueriesShared.sizeStreamParts(2 * mb, 32) == 8)
    assert(QueriesShared.sizeStreamParts(16 * mb, 32) == 8)
    // sf10 events (162 MB): 40 raw slices, capped at the 32-core box —
    // the width the 4.1x join measurement certified.
    assert(QueriesShared.sizeStreamParts(162 * mb, 32) == 32)
    // sf10 documents (58 MB): between floor and cap.
    assert(QueriesShared.sizeStreamParts(58 * mb, 32) == 14)
    // Narrow session: the 8-partition floor wins over the core cap
    // (state-granularity choice, not a parallelism one).
    assert(QueriesShared.sizeStreamParts(200 * mb, 4) == 8)
    assert(QueriesShared.sizeStreamParts(0L, 32) == 8)
  }

  test("listing path: small SFs and missing tables resolve to the floor") {
    assert(QueriesShared.streamParts(spark, "/root/testdata/sf0.01") == 8)
    assert(QueriesShared.streamParts(spark, "/root/testdata/sf0.1") == 8)
    assert(QueriesShared.streamParts(spark, "/nonexistent_sf_dir") == 8,
      "an unreadable table must fall back to the floor, never throw")
    // Sparse 200 MB fixture: listing sees the apparent length (floor
    // still wins on this local[4] test session — the arithmetic case
    // above covers the widening; this case covers the listing).
    val dir = graft.util.Scratch.dir("streamparts_fixture")
    val table = Paths.get(dir, "events.parquet")
    Files.createDirectories(table)
    val f = table.resolve("part-00000.bin")
    val ch = java.nio.channels.FileChannel.open(f,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      ch.position(200L * 1024 * 1024 - 1)
      ch.write(java.nio.ByteBuffer.wrap(Array(0: Byte)))
      ()
    } finally ch.close()
    val cores = spark.sparkContext.defaultParallelism
    assert(QueriesShared.streamParts(spark, dir) ==
      QueriesShared.sizeStreamParts(200L * 1024 * 1024, cores))
  }
}
