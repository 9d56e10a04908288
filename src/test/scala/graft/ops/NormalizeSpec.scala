package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Golden pairs from the reference's unit tests:
  * quarter boundaries (test_transform.py:84-100), date formats
  * (test_edge_cases.py:350-364), decimal coercion incl. the millions
  * heuristic (test_transform.py:176-191, test_edge_cases.py:366-381).
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def parseOne(raw: String): Option[java.sql.Date] =
    Seq(raw).toDF("raw")
      .select(Normalize.parseDateMulti(col("raw")).as("d"))
      .collect().map(r => Option(r.getDate(0))).head

  test("multi-format date parse: every reference format") {
    assert(parseOne("2025-06-30").contains(sqlDate("2025-06-30")))
    assert(parseOne("2025-06-30 14:30:00").contains(sqlDate("2025-06-30")))
    assert(parseOne("06/30/2025").contains(sqlDate("2025-06-30")))
    assert(parseOne("2025").contains(sqlDate("2025-12-31")))      // bare year
    assert(parseOne("2025.0").contains(sqlDate("2025-12-31")))    // float year
    assert(parseOne("invalid-date").isEmpty)
    assert(parseOne("").isEmpty)
  }

  test("quarter label: all 8 boundary dates (reference test_transform.py:84-100)") {
    val boundaries = Seq(
      "2025-01-01" -> "2025-Q1", "2025-03-31" -> "2025-Q1",
      "2025-04-01" -> "2025-Q2", "2025-06-30" -> "2025-Q2",
      "2025-07-01" -> "2025-Q3", "2025-09-30" -> "2025-Q3",
      "2025-10-01" -> "2025-Q4", "2025-12-31" -> "2025-Q4")
    val got = boundaries.map(_._1).toDF("d")
      .select(col("d"), Normalize.quarterLabel(to_date(col("d"))).as("label"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    boundaries.foreach { case (d, expected) => assert(got(d) == expected, s"date $d") }
  }

  private def coerceOne(raw: String): Option[BigDecimal] =
    Seq(raw).toDF("raw")
      .select(Normalize.safeDecimal(col("raw")).as("v"))
      .collect().map(r => Option(r.getDecimal(0)).map(BigDecimal(_))).head

  test("safe decimal coercion table (reference test_edge_cases.py:366-381)") {
    // millions heuristic: 0 < v < 1e6 scales by 1e6
    assert(coerceOne("22500").contains(BigDecimal("22500000000.00")))
    assert(coerceOne("1500.5").contains(BigDecimal("1500500000.00")))
    // at/above 1e6 passes through
    assert(coerceOne("22500000000").contains(BigDecimal("22500000000.00")))
    assert(coerceOne("1000000").contains(BigDecimal("1000000.00")))
    // formatted strings are cleaned first
    assert(coerceOne("$1,500,000,000").contains(BigDecimal("1500000000.00")))
    assert(coerceOne(" 42 ").contains(BigDecimal("42000000.00")))
    // sentinels and garbage -> null
    assert(coerceOne("N/A").isEmpty)
    assert(coerceOne("n/a").isEmpty)
    assert(coerceOne("-").isEmpty)
    assert(coerceOne("").isEmpty)
    assert(coerceOne("TBD").isEmpty)
    // negatives are NOT scaled by the transform-side heuristic (0 < v guard)
    assert(coerceOne("-999.99").contains(BigDecimal("-999.99")))
    // zero is not scaled
    assert(coerceOne("0").contains(BigDecimal("0.00")))
    // sub-cent values scale BEFORE quantization (reference parses into an
    // unbounded Decimal and quantizes only at the sink): 1e-6 -> 1.00
    assert(coerceOne("0.000001").contains(BigDecimal("1.00")))
    // beyond the default (15,2) bound -> null; precision=38 keeps it
    // (reference extreme-values case, test_edge_cases.py:188-205)
    assert(coerceOne("999999999999999").isEmpty)
    val wide = Seq("999999999999999").toDF("raw")
      .select(Normalize.safeDecimal(col("raw"), precision = 38).as("v"))
      .collect().head.getDecimal(0)
    assert(BigDecimal(wide) == BigDecimal("999999999999999.00"))
  }

  test("millions validator (config.py:89-97) scales negatives too") {
    val got = Seq("-999.99", "500.00", "2000000.00").toDF("raw")
      .select(Normalize.millionsValidator(col("raw").cast("decimal(15,2)")).as("v"))
      .collect().map(r => BigDecimal(r.getDecimal(0)))
    assert(got(0) == BigDecimal("-999990000.00")) // negative scaled (reference quirk)
    assert(got(1) == BigDecimal("500000000.00"))
    assert(got(2) == BigDecimal("2000000.00"))
  }

  test("EPS estimation (transform.py:188-201)") {
    val got = Seq(
      (1000000000.0, 3160L),  // net income >= 1e6: scale to millions first
      (500000.0, 1000L))      // below 1e6: raw divide
      .toDF("ni", "shares")
      .select(Normalize.estimateEps(col("ni"), col("shares")).as("eps"))
      .collect().map(r => BigDecimal(r.getDecimal(0)))
    assert(got(0) == BigDecimal("0.3165"))   // (1e9/1e6)/3160 = 0.31645... -> 0.3165
    assert(got(1) == BigDecimal("500.0000")) // 500000/1000
  }

  test("shares lookup with default (transform.py:193-194)") {
    val shares = Map("TSLA" -> 3160, "RIVN" -> 920, "LCID" -> 1600)
    val got = Seq("TSLA", "RIVN", "LCID", "XXXX").toDF("t")
      .select(Normalize.sharesFor(col("t"), shares).as("s"))
      .collect().map(_.getInt(0))
    assert(got.toSeq == Seq(3160, 920, 1600, 1000))
  }

  test("truthy coalesce skips zero AND null (transform.py:82)") {
    val got = Seq[(java.lang.Double, java.lang.Double)](
      (null, 2.0), (0.0, 3.0), (1.5, 9.0))
      .toDF("a", "b")
      .select(Normalize.coalesceKeyTruthy(col("a"), col("b")).as("v"))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(2.0, 3.0, 1.5))
  }
}
