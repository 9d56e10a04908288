package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Tripwire for driver testdata regenerations, generalized beyond
  * `events.ts` (round 6 lost 12 gates to a silent encoding change; the
  * round-7 fix covered one column of one table). Every driver table read
  * is asserted against `Tables.declaredTables`: a renamed, dropped,
  * added, or retyped column fails AT THE READER with one line naming the
  * drift — "testdata drift: events.ts {timestamp|timestamp_ntz|bigint}
  * ->string" — instead of erroring a dozen downstream gates. The three
  * known timestamp encodings stay green on every ts-bearing table
  * (events.ts via EventTimeEncodingSpec; orders/lineitem here).
  */
class TestdataDriftSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  /** Stage `df` as `$base/<table>.parquet` and return the dir. */
  private def stage(tag: String, name: String, df: DataFrame): String = {
    val d = graft.util.Scratch.dir(s"drift_$tag")
    df.coalesce(1).write.mode("overwrite").parquet(s"$d/$name.parquet")
    d
  }

  private def driftMessage(body: => DataFrame): String = {
    val e = intercept[IllegalStateException] { body.collect() }
    assert(e.getMessage.startsWith("testdata drift: "),
      s"drift must fail with a named one-liner, got: ${e.getMessage}")
    e.getMessage
  }

  test("retyped column fails loudly at the reader with the drifted type named") {
    val dir = stage("retype", "events",
      Tables.events(spark, src).withColumn("ts", date_format(col("ts"), "yyyy-MM-dd")))
    val msg = driftMessage(Tables.events(spark, dir))
    assert(msg.contains("events.ts") && msg.contains("->string"), msg)
  }

  test("dropped and renamed columns fail loudly at the reader") {
    val docs = Tables.documents(spark, src)
    val dropped = stage("drop", "documents", docs.drop("n_chars"))
    assert(driftMessage(Tables.documents(spark, dropped))
      .contains("documents.n_chars missing"))
    val renamed = stage("rename", "documents", docs.withColumnRenamed("lang", "language"))
    val msg = driftMessage(Tables.documents(spark, renamed))
    assert(msg.contains("documents.lang missing") &&
      msg.contains("documents.language unexpected"), msg)
  }

  test("added column fails loudly at the reader") {
    val dir = stage("add", "orders",
      Tables.orders(spark, src).withColumn("o_comment", lit("x")))
    assert(driftMessage(Tables.orders(spark, dir))
      .contains("orders.o_comment unexpected"))
  }

  test("non-ts numeric retype fails loudly (no silent widening)") {
    val dir = stage("widen", "customer",
      Tables.customer(spark, src).withColumn("c_nationkey", col("c_nationkey").cast("long")))
    val msg = driftMessage(Tables.customer(spark, dir))
    assert(msg.contains("customer.c_nationkey") && msg.contains("->bigint"), msg)
  }

  test("orders/lineitem timestamp columns normalize across all three encodings") {
    def variants(name: String, tsCol: String, df: DataFrame): Seq[(String, String)] = Seq(
      "ltz" -> stage(s"${name}_ltz", name, df),
      "ntz" -> stage(s"${name}_ntz", name,
        df.withColumn(tsCol, col(tsCol).cast(TimestampNTZType))),
      "nanos_long" -> stage(s"${name}_nanos", name,
        df.withColumn(tsCol, expr(s"unix_micros($tsCol) * 1000"))))
    Seq(("orders", "o_orderkey", "o_orderdate"),
        ("lineitem", "l_orderkey", "l_shipdate")).foreach { case (name, key, tsCol) =>
      val ref = Tables.table(spark, src, name)
      val want = ref.select(col(key), col(tsCol)).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
      variants(name, tsCol, ref).foreach { case (tag, dir) =>
        val got = Tables.table(spark, dir, name)
        assert(got.schema(tsCol).dataType == TimestampType,
          s"$name/$tag: $tsCol must normalize to TimestampType")
        val rows = got.select(col(key), col(tsCol)).collect()
          .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
        assert(rows == want, s"$name/$tag: normalized instants must match the source")
      }
    }
  }

  test("all ten driver tables read green against the declared schemas") {
    Tables.declaredTables.keys.foreach { name =>
      assert(Tables.table(spark, src, name).count() > 0, s"$name must be non-empty")
    }
  }
}
