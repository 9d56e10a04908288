package graft.io

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.ops.Quality

/** Reference O-F3 parity: malformed input rows are tolerated, captured,
  * and countable — never a task failure (test_edge_cases.py:108-206).
  */
class CorruptRecordSpec extends SparkSpec {

  test("malformed JSON lines land in the corrupt-record column and quarantine") {
    val dir = Files.createTempDirectory("corrupt").toString
    Files.write(java.nio.file.Paths.get(dir, "data.json"),
      Seq(
        """{"date": "2025-06-30", "symbol": "TSLA", "revenue": 22500000000}""",
        """{"date": "2025-03-31", "symbol": "RIVN", "revenue": }""", // malformed
        """not json at all""",
        """{"date": "2025-03-31", "symbol": "LCID", "revenue": 800000000}""")
        .mkString("\n").getBytes)

    val schema = StructType(Seq(
      StructField("date", StringType),
      StructField("symbol", StringType),
      StructField("revenue", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache() // corrupt-record column requires a materialization boundary

    val (clean, bad) = Quality.quarantine(df, col("_corrupt_record").isNull)
    assert(clean.count() == 2)
    assert(bad.count() == 2)
    assert(clean.select("symbol").collect().map(_.getString(0)).toSet == Set("TSLA", "LCID"))
    val rawBad = bad.select("_corrupt_record").collect().map(_.getString(0))
    assert(rawBad.exists(_.contains("not json at all")))
    df.unpersist()
  }
}
