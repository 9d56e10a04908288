package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the reference pipeline's shape (§3.1) over the testdata — facts ⋈
    * broadcast dim ⋈ dim, quarter-label derivation, exact decimal revenue
    * rollup. One broadcast join stage + one hash-aggregate shuffle.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), ops.Normalize.quarterLabel(col("o_orderdate")).as("quarter_label"))
      .agg(
        sum(col("o_totalprice").cast(DecimalType(15, 2))).cast(DecimalType(18, 2)).as("revenue"),
        count(lit(1)).as("order_cnt"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** DuckDB twins for the driver's correctness gate; keys without a twin
    * (sketches, mapPartitions stubs) get a rows-only check. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
