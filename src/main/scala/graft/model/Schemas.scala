package graft.model

import java.sql.Date
import org.apache.spark.sql.types._

/** Declared schemas and typed rows (SURVEY.md §1.2): explicit StructTypes
  * at every ingestion boundary (never `inferSchema`), case classes at the
  * typed core.
  */
object Schemas {

  /** Bronze FMP income-statement JSON (FIXTURES.md §1): string-tolerant —
    * every metric may arrive as a number, a formatted string, or a
    * sentinel; normalization owns the coercion.
    */
  val fmpIncome: StructType = StructType(Seq(
    StructField("date", StringType),
    StructField("symbol", StringType),
    StructField("revenue", StringType),
    StructField("eps", StringType),
    StructField("netIncomePerShare", StringType),
    StructField("grossProfit", StringType),
    StructField("netIncome", StringType),
    StructField("calendarYear", StringType),
    StructField("period", StringType)))

  /** Bronze analyst-estimates JSON (FIXTURES.md §2). */
  val fmpEstimates: StructType = StructType(Seq(
    StructField("date", StringType),
    StructField("symbol", StringType),
    StructField("estimatedRevenueAvg", StringType),
    StructField("estimatedEpsAvg", StringType),
    StructField("numberAnalystsEstimatedRevenue", StringType)))

  /** Processed CSV export / re-ingest shape (FIXTURES.md §4). */
  val processedCsv: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("quarter_date", DateType, nullable = false),
    StructField("quarter_label", StringType, nullable = false),
    StructField("revenue", DecimalType(15, 2)),
    StructField("eps", DecimalType(10, 4)),
    StructField("gross_profit", DecimalType(15, 2))))

  /** Validated financial row (reference FinancialData, config.py:79-97).
    * Facts are keyed by the natural key (ticker, quarter_date) — no
    * surrogate ids (SURVEY.md §7.5.3).
    */
  final case class FinancialData(
      ticker: String,
      quarter_date: Date,
      quarter_label: String,
      revenue: Option[BigDecimal],
      eps: Option[BigDecimal],
      gross_profit: Option[BigDecimal])

  /** Validated estimate row (reference EstimateData, config.py:100-108). */
  final case class EstimateData(
      ticker: String,
      quarter_date: Date,
      quarter_label: String,
      estimated_revenue: Option[BigDecimal],
      estimated_eps: Option[BigDecimal],
      analyst_count: Option[Int])

  /** Company dimension (reference schema.sql:8-15), natural key = ticker. */
  final case class Company(ticker: String, name: String, sector: String)
}
