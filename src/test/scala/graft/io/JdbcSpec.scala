package graft.io

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JDBC connector against embedded Derby: round trip, partitioned read
  * fan-out, and set-based MERGE upsert (reference load.py:87-161).
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private def freshUrl(): String = {
    val dir = graft.util.Scratch.dir("graft_derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  test("write + partitioned read round-trips rows and fans out slices") {
    val url = freshUrl()
    val df = spark.range(0, 1000).select(
      $"id", concat(lit("name_"), $"id").as("name"), ($"id" % 7).cast("double").as("score"))
    Jdbc.writeTable(df, url, "items", SaveMode.Overwrite,
      columnTypes = Some("name VARCHAR(32)"))

    val back = Jdbc.readPartitioned(spark, url, "items", "id", 0L, 1000L, 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 1000)
    val row = back.where($"id" === 42).collect().head
    assert(row.getAs[String]("name") == "name_42")
    assert(row.getAs[Double]("score") == 0.0)
  }

  test("mergeUpsert: matched rows updated, new rows inserted, intra-batch dedup applied") {
    val url = freshUrl()
    val seed = Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1)).toDF("k", "v", "gen")
    Jdbc.writeTable(seed, url, "state", SaveMode.Overwrite,
      columnTypes = Some("v VARCHAR(16)"))

    // Batch carries a duplicate key (k=2) — the later gen must win.
    val batch = Seq((2L, "b2", 2), (2L, "b3", 3), (4L, "d", 2)).toDF("k", "v", "gen")
    Jdbc.mergeUpsert(spark, url, "state", batch, Seq("k"), Seq(col("gen").desc))

    val out = Jdbc.readTable(spark, url, "state")
      .orderBy("k").as[(Long, String, Int)].collect().toSeq
    assert(out == Seq((1L, "a", 1), (2L, "b3", 3), (3L, "c", 1), (4L, "d", 2)))
  }

  test("predicates push into the database query, not a post-scan filter") {
    val url = freshUrl()
    val df = spark.range(0, 100).select($"id", ($"id" * 2).as("v"))
    Jdbc.writeTable(df, url, "pushed", SaveMode.Overwrite)
    val filtered = Jdbc.readTable(spark, url, "pushed").where($"id" === 7L)
    // The JDBC scan must carry the predicate (the database serves an
    // indexed point lookup at scale); a plan that reads the whole table
    // and filters in Spark would ship every row over the wire.
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("id"), scan.take(500))
    assert(filtered.collect().map(_.getLong(1)).toSeq == Seq(14L))
  }

  test("upsertSql: PostgreSQL dialect generates ON CONFLICT, default generates MERGE") {
    val cols = Seq("k", "v", "gen")
    val keys = Seq("k")
    // Reference load.py:128-154 / schema.sql:30 target Postgres ON
    // CONFLICT; no Postgres ships in this container, so the generated
    // statement itself is the pinned contract.
    val pg = Jdbc.upsertSql("jdbc:postgresql://db/corp", "state", "state_stage_ab12cd34",
      cols, keys)
    assert(pg ==
      """INSERT INTO state ("k", "v", "gen")
        |SELECT "k", "v", "gen" FROM state_stage_ab12cd34
        |ON CONFLICT ("k")
        |DO UPDATE SET "v" = EXCLUDED."v", "gen" = EXCLUDED."gen"""".stripMargin)
    val derby = Jdbc.upsertSql("jdbc:derby:/tmp/db", "state", "state_stage_ab12cd34",
      cols, keys)
    assert(derby.startsWith("MERGE INTO state t USING state_stage_ab12cd34 s"))
    assert(derby.contains("""WHEN MATCHED THEN UPDATE SET "v" = s."v", "gen" = s."gen""""))
    assert(derby.contains("""WHEN NOT MATCHED THEN INSERT ("k", "v", "gen")"""))
  }

  test("mergeUpsert rejects non-identifier table and column names") {
    val url = freshUrl()
    val batch = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Jdbc.mergeUpsert(spark, url, "state; DROP TABLE x", batch, Seq("k"), Seq(col("v")))
    }
    intercept[IllegalArgumentException] {
      Jdbc.mergeUpsert(spark, url, "state", batch.withColumnRenamed("v", "v\"x"),
        Seq("k"), Seq(col("k")))
    }
  }

  test("mergeUpsert drops its stage table even when the MERGE fails") {
    val url = freshUrl()
    val seed = Seq((1L, "a")).toDF("k", "v")
    Jdbc.writeTable(seed, url, "state3", SaveMode.Overwrite,
      columnTypes = Some("v VARCHAR(16)"))
    // Incompatible batch schema: stage write succeeds, MERGE fails
    // (column w does not exist on the target).
    val bad = Seq((2L, "b", 9)).toDF("k", "v", "w")
    intercept[Exception] {
      Jdbc.mergeUpsert(spark, url, "state3", bad, Seq("k"), Seq(col("w")))
    }
    // No *_stage_* table may survive the failure.
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      val names = Iterator.continually(rs).takeWhile(_.next()).map(_.getString(3)).toList
      assert(!names.exists(_.toLowerCase.contains("_stage_")), names.toString)
    } finally conn.close()
  }

  test("mergeUpsert is idempotent: re-applying the same batch changes nothing") {
    val url = freshUrl()
    val seed = Seq((1L, "a", 1)).toDF("k", "v", "gen")
    Jdbc.writeTable(seed, url, "state2", SaveMode.Overwrite,
      columnTypes = Some("v VARCHAR(16)"))
    val batch = Seq((1L, "a2", 2), (5L, "e", 2)).toDF("k", "v", "gen")
    Jdbc.mergeUpsert(spark, url, "state2", batch, Seq("k"), Seq(col("gen").desc))
    val once = Jdbc.readTable(spark, url, "state2").orderBy("k").collect().toSeq
    Jdbc.mergeUpsert(spark, url, "state2", batch, Seq("k"), Seq(col("gen").desc))
    val twice = Jdbc.readTable(spark, url, "state2").orderBy("k").collect().toSeq
    assert(once == twice)
  }
}
