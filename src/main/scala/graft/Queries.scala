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

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Shares-analog literal dim over nation names (reference
    * transform.py:193-194 {TSLA:3160, RIVN:920, LCID:1600, default 1000}).
    */
  private val NationShares = Map("NATION_1" -> 3160, "NATION_2" -> 920, "NATION_3" -> 1600)

  private val Dec152 = DecimalType(15, 2)

  /** Run `body` with `spark.sql.shuffle.partitions` scoped to `n`,
    * restoring the session value after. The live-streaming gates use
    * this: every stateful streaming op materializes ONE state store per
    * shuffle partition, so partition count should track stateful-key
    * cardinality (~150 users / few-k windows here), not CPU count —
    * 32 state stores for 150 keys is pure per-batch overhead. At real
    * scale the same knob is sized UP with the keyspace (SCALE.md knobs).
    */
  private def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Batch sessionization over the events table (gap > 30 min starts a
    * session): lag + running sum of start flags assigns session ids in
    * two window passes over ONE shuffle (same partitioning), then one
    * aggregate. Shared by the `events_sessionize` gate and the
    * interval-join gate (events labeled with their containing session).
    */
  private def batchSessions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMs = 30L * 60 * 1000
    val withFlag = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev_ts"))) >= gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withFlag.groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"))
  }

  /** Deterministic bronze income-JSON fixture derived from `orders`
    * (shared by pipeline_income_normalize / pipeline_run_state): per
    * `o_orderkey % 4`, rows exercise the ISO date, the truthiness
    * date-key fallback (O-P4), the `N/A` revenue sentinel, the MM/dd/yyyy
    * format, the `$`-prefix strip, and the eps-estimation fallback.
    * `badDates=true` swaps the m==1 fallback path for an unparseable
    * date+year so those rows exercise the quarantine split instead.
    */
  private def incomeBronzeFixture(s: SparkSession, dir: String,
                                  badDates: Boolean): DataFrame = {
    val m = pmod(col("o_orderkey"), lit(4))
    val numS = col("o_totalprice").cast(Dec152).cast(StringType)
    val m1Date = if (badDates) lit("not-a-date") else lit("")
    val m1Year = if (badDates) lit("bad") else year(col("o_orderdate")).cast(StringType)
    t(s, dir, "orders").where(col("o_orderkey") < 2000).select(
      when(m === 1, m1Date)
        .when(m === 3, date_format(col("o_orderdate"), "MM/dd/yyyy"))
        .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("date"),
      concat(lit("TK"), pmod(col("o_orderkey"), lit(5)).cast(StringType)).as("symbol"),
      when(m === 2, lit("N/A")).otherwise(numS).as("revenue"),
      when(m === 3, lit("")).otherwise(numS).as("eps"),
      lit(null).cast(StringType).as("netIncomePerShare"),
      concat(lit("$"), numS).as("grossProfit"),
      // Whole dollars (floor — exact in every engine): the eps-estimation
      // path divides by 10^3-shaped share counts and rounds to 4 places;
      // 2-decimal inputs would land exactly on rounding boundaries where
      // engines legitimately disagree on the last ulp.
      floor(col("o_totalprice")).cast(LongType).cast(StringType).as("netIncome"),
      when(m === 1, m1Year).otherwise(year(col("o_orderdate")).cast(StringType))
        .as("calendarYear"),
      lit("Q1").as("period"))
  }

  // ---------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- 2.4 aggregations -------------------------------------------------
    // TPC-H-Q1-style pricing summary: decimal sums (order-independent).
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // Decimal sum internally (order-independent exact), DOUBLE at the
          // surface: both engines convert the same decimal value via IEEE
          // nearest, so the driver's pandas dtype-sensitive hash matches.
          sum(col("l_quantity").cast(Dec152)).cast(DoubleType).as("sum_qty"),
          sum(col("l_extendedprice").cast(Dec152)).cast(DoubleType).as("sum_base_price"),
          count(lit(1)).as("count_order"))
    }),

    // O-A1 distinct keys (load.py:94).
    "agg_distinct_tickers" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderpriority")).distinct()),

    // O-A3 per-group counts (load.py:233-243).
    "agg_group_count" -> ((s, dir) =>
      t(s, dir, "orders").groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))),

    // O-A4 per-group + grand total in one pass via ROLLUP (main.py:128).
    "agg_rollup_total" -> ((s, dir) =>
      Summary.countsWithTotal(t(s, dir, "orders").select(col("o_orderstatus")), "o_orderstatus")),

    // CUBE extension (free via Catalyst; SURVEY.md §2.4).
    "agg_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))),

    // Exact distinct-count aggregate.
    "agg_distinct_users" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("cnt"))),

    // ---- 2.8 scalar functions --------------------------------------------
    // O-X2 quarter-label derivation (transform.py:31-57).
    "fn_quarter_label" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(Normalize.quarterLabel(col("o_orderdate")).as("quarter_label"))
        .agg(count(lit(1)).as("cnt"))),

    // O-X1 multi-format lenient date parse (transform.py:141-166): render
    // each order date in one of 4 formats keyed by o_orderkey, parse back.
    "fn_parse_date_multi" -> ((s, dir) => {
      val m = pmod(col("o_orderkey"), lit(4))
      val raw = when(m === 0, date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .when(m === 1, date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
        .when(m === 2, date_format(col("o_orderdate"), "MM/dd/yyyy"))
        .otherwise(date_format(col("o_orderdate"), "yyyy"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), raw.as("raw"))
        .withColumn("parsed", Normalize.parseDateMulti(col("raw")))
    }),

    // O-X1 label-path 4-format parse (transform.py:36-49): day-first
    // fallback after month-first — 13/01/2020 parses as Jan 13; ambiguous
    // 05/06/2020 stays month-first (May 6), exactly the reference's try
    // order.
    "fn_parse_date_dayfirst" -> ((s, dir) => {
      val m = pmod(col("o_orderkey"), lit(3))
      val raw = when(m === 0, date_format(col("o_orderdate"), "MM/dd/yyyy"))
        .when(m === 1, date_format(col("o_orderdate"), "dd/MM/yyyy"))
        .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), raw.as("raw"))
        .withColumn("parsed", Normalize.parseDateLabelPath(col("raw")))
        .withColumn("quarter_label", Normalize.quarterLabel(col("parsed")))
    }),

    // O-X3 safe decimal coercion (transform.py:168-186): dirty string
    // variants ($-prefix, trailing space, N/A sentinel) -> cleaned decimal
    // with the millions heuristic.
    "fn_safe_decimal" -> ((s, dir) => {
      val sStr = col("o_totalprice").cast(Dec152).cast(StringType)
      val m = pmod(col("o_orderkey"), lit(4))
      val raw = when(m === 0, concat(lit("$"), sStr))
        .when(m === 1, concat(sStr, lit(" ")))
        .when(m === 2, lit("N/A"))
        .otherwise(sStr)
      t(s, dir, "orders")
        .select(col("o_orderkey"), raw.as("raw"))
        .withColumn("val", Normalize.safeDecimal(col("raw")))
        .select(col("o_orderkey"), col("val").cast(DoubleType).as("val"))
    }),

    // O-X4 + O-J6 EPS estimation over a literal shares map
    // (transform.py:188-201): per-nation "net income" = exact decimal sum
    // of customer balances, then the reference's millions-aware division.
    "fn_estimate_eps" -> ((s, dir) => {
      val ni = t(s, dir, "customer")
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("c_acctbal").cast(Dec152)).cast(DoubleType).as("net_income"))
        .withColumn("shares", Normalize.sharesFor(col("n_name"), NationShares).cast(LongType))
      ni.withColumn("eps",
          Normalize.estimateEps(col("net_income"), col("shares")).cast(DoubleType))
        .select(col("n_name"), col("net_income"), col("shares"), col("eps"))
    }),

    // O-X5 tolerance comparison (transform.py:245-259).
    "fn_tolerance_check" -> ((s, dir) =>
      t(s, dir, "orders").where(col("o_orderkey") < 50)
        .select(col("o_orderkey"),
          Quality.withinTolerance(col("o_totalprice"), lit(150000.0), lit(50000.0))
            .as("within_tol"))),

    // O-X6 label-format validation (config.py:84).
    "fn_label_rlike" -> ((s, dir) => {
      val label = when(pmod(col("o_orderkey"), lit(3)) === 0, lit("bad-label"))
        .otherwise(Normalize.quarterLabel(col("o_orderdate")))
      t(s, dir, "orders")
        .select(label.as("quarter_label"))
        .groupBy(Quality.labelValid(col("quarter_label")).as("valid"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // ---- 2.2 projections / filters ---------------------------------------
    // O-P1 core projection + derived columns (transform.py:68-100).
    "project_normalize" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderpriority").as("ticker"),
        col("o_orderdate").cast(DateType).as("quarter_date"),
        Normalize.quarterLabel(col("o_orderdate")).as("quarter_label"),
        col("o_totalprice").cast(Dec152).cast(DoubleType).as("revenue"))),

    // O-F1 invalid-date filter (transform.py:77-79): some raw strings are
    // unparseable; keep only rows with a parseable date.
    "filter_valid_date" -> ((s, dir) => {
      val m = pmod(col("o_orderkey"), lit(4))
      val raw = when(m === 0, date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .when(m === 1, date_format(col("o_orderdate"), "MM/dd/yyyy"))
        .when(m === 2, lit("invalid-date"))
        .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), Normalize.parseDateMulti(raw).as("parsed"))
        .where(col("parsed").isNotNull)
    }),

    // O-F4 golden-row lookup (transform.py:236-239).
    "filter_golden_row" -> ((s, dir) =>
      t(s, dir, "orders").where(col("o_orderkey") === 100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // ---- 2.3 joins --------------------------------------------------------
    // O-J1 FK resolution: facts ⋈ broadcast dim (load.py:94-116).
    "join_fk_resolve" -> ((s, dir) =>
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"))),

    // O-J2 insert-if-absent probe: dim rows with no facts in the recent
    // window (load.py:65-74).
    "join_anti_new" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").where(col("o_orderdate") >= lit("2000-01-01"))
          .select(col("o_custkey").as("c_custkey")).distinct(),
          Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))),

    // O-U2 set-difference form of the same (load.py:70).
    "except_new_tickers" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"))
        .except(t(s, dir, "orders").where(col("o_orderdate") >= lit("2000-01-01"))
          .select(col("o_custkey").as("c_custkey")))),

    // O-J4/O-A3 dim left-joined to per-key fact counts (load.py:229-246).
    "join_summary" -> ((s, dir) =>
      Summary.dimFactCounts(t(s, dir, "customer"), t(s, dir, "orders"),
        "c_custkey", "o_custkey", "order_cnt")),

    // O-J6 literal-map dim lookup with default (transform.py:193-194).
    "join_shares_lookup" -> ((s, dir) =>
      t(s, dir, "nation").select(col("n_nationkey"), col("n_name"),
        Normalize.sharesFor(col("n_name"), NationShares).cast(LongType).as("shares"))),

    // O-F6 unresolved-FK accounting: facts whose key misses a restricted
    // dim, counted per key (load.py:103-107 skip-and-count).
    "anti_unresolved" -> ((s, dir) =>
      Tables.events(s, dir)
        .join(t(s, dir, "customer").where(col("c_custkey") < 100)
          .select(col("c_custkey").as("user_id")), Seq("user_id"), "left_anti")
        .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))),

    // Deterministic salt fallback for AQE-resistant skew (ops/Skew): the
    // gate proves the salted form is semantically identical to the plain
    // equi-join (the salt must never change results, only task layout).
    "join_salted_skew" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"), col("value"))
      val dim = t(s, dir, "customer").where(col("c_custkey") < 200)
        .select(col("c_custkey").as("user_id"), col("c_name"))
      graft.ops.Skew.saltedJoin(ev, dim, Seq("user_id"), buckets = 8)
        .select(col("user_id"), col("event_id"), col("value"), col("c_name"))
    }),

    // ---- 2.5 windows / sort / top-k ---------------------------------------
    // O-L2 top-k per group (extract.py:162): 2 most recent lineitems per order.
    "window_topk_quarters" -> ((s, dir) =>
      Windows.topKPerGroup(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate")),
        Seq("l_orderkey"), Seq(col("l_shipdate").desc, col("l_linenumber").asc), 2)),

    // Frame-spec window + lag extension: exact running sum per user.
    "window_running_total" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir).select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("running_sum",
          sum(col("value").cast(DecimalType(18, 6)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType))
        .withColumn("prev_value", lag(col("value"), 1).over(w))
    }),

    // O-O1 export sort (transform.py:277).
    "sort_export" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
        .orderBy(col("o_custkey").asc, col("o_orderdate").desc, col("o_orderkey").asc)),

    // ---- 2.6 set ops ------------------------------------------------------
    // INTERSECT (SURVEY §2.6 noted it available-if-needed): customers who
    // DO have recent orders — the complement of except_new_tickers.
    "intersect_active" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"))
        .intersect(t(s, dir, "orders").where(col("o_orderdate") >= lit("2000-01-01"))
          .select(col("o_custkey").as("c_custkey")))),

    // Canonical text normalization (case/whitespace collapse) ahead of
    // fingerprinting — exercised as its own gate so the oracle pins the
    // exact normalization.
    "text_normalize" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        md5(TextAnalysis.normalizeText(col("text"))).as("norm_md5"),
        length(TextAnalysis.normalizeText(col("text"))).cast(LongType).as("norm_len"))),

    // O-U1 union of normalized source branches (transform.py:205-230).
    "union_sources" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.where(col("o_orderstatus") === "O").select(col("o_orderkey"), lit("src_o").as("src"))
      val b = o.where(col("o_orderstatus") =!= "O").select(col("o_orderkey"), lit("src_other").as("src"))
      a.unionByName(b).groupBy(col("src")).agg(count(lit(1)).as("cnt"))
    }),

    // ---- 2.7 merge / dedup ------------------------------------------------
    // O-M1 last-write-wins MERGE on the natural key (load.py:122-154):
    // even event_ids are current state, odd are the incoming batch.
    "merge_upsert" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(
        col("user_id"), col("event_type"), col("event_id"), col("ts"), col("value"))
      val current = ev.where(pmod(col("event_id"), lit(2)) === 0)
      val incoming = ev.where(pmod(col("event_id"), lit(2)) === 1)
      Merge.mergeUpsert(current, incoming, Seq("user_id", "event_type"),
        Seq(col("ts").desc, col("event_id").desc))
    }),

    // O-M3 deterministic intra-batch dedup (SURVEY.md §7.5.4).
    "dedupe_batch" -> ((s, dir) =>
      Merge.lastWriteWins(
        Tables.events(s, dir).select(col("user_id"), col("event_type"), col("event_id"),
          col("ts"), col("value")),
        Seq("user_id", "event_type"), Seq(col("ts").desc, col("event_id").desc))),

    // O-M2 dim insert-if-absent (load.py:65-74): existing rows win.
    "dedupe_dim" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val existing = c.where(pmod(col("c_custkey"), lit(3)) === 0)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val incoming = c.select(col("c_custkey"),
        concat(col("c_name"), lit("_new")).as("c_name"), col("c_acctbal"))
      Merge.insertIfAbsent(existing, incoming, Seq("c_custkey"))
    }),

    // Partition-scoped MERGE (the 100 TB state-table path): seed a state
    // partitioned by event_type with clicks+views, merge the purchases
    // batch — only that partition is read+rewritten. Final state equals a
    // global last-write-wins (same oracle as dedupe_batch restricted to
    // the three types).
    "merge_partitioned" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(
        col("user_id"), col("event_type"), col("event_id"), col("ts"), col("value"))
        .where(col("event_type").isin("click", "view", "purchase"))
      val prec = Seq(col("ts").desc, col("event_id").desc)
      val statePath = graft.util.Scratch.dir("graft_pmerge") + "/state"
      Merge.lastWriteWins(ev.where(col("event_type").isin("click", "view")),
          Seq("user_id", "event_type"), prec)
        .write.partitionBy("event_type").parquet(statePath)
      Merge.mergeIntoPartitionedState(s, statePath,
          ev.where(col("event_type") === "purchase"),
          Seq("user_id", "event_type"), prec, "event_type")
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts"), col("value"))
    }),

    // Engine-owned uniqueness assertion (SURVEY.md §4): keys violating the
    // (user_id, event_type) contract, with multiplicity.
    "assert_unique_key" -> ((s, dir) =>
      Quality.duplicateKeys(
        Tables.events(s, dir).select(col("user_id"), col("event_type")),
        Seq("user_id", "event_type"))),

    // ---- 2.1 sources / sinks ----------------------------------------------
    // S7+S12 round trip: typed CSV export then schema-declared re-ingest
    // must be lossless (reference load.py:202-227 loop-closing path).
    "csv_roundtrip" -> ((s, dir) => {
      val proj = t(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderdate").cast(DateType).as("o_date"),
        col("o_totalprice").cast(Dec152).as("o_price"),
        col("o_orderstatus"))
      val tmp = graft.util.Scratch.dir("graft_csv_rt")
      proj.write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.schema(StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_date", DateType),
          StructField("o_price", Dec152),
          StructField("o_orderstatus", StringType))))
        .option("header", "true").csv(tmp)
        // Decimal end-to-end through the CSV sink+source; DOUBLE only at
        // the gate surface (driver dtype canonicalization).
        .withColumn("o_price", col("o_price").cast(DoubleType))
    }),

    // Partition-pruned state layout (SURVEY.md §4 "partition-by layout ->
    // partition pruning"): write a hive-partitioned Parquet state table,
    // read back one partition — the scan lists only that directory.
    "partitioned_state_prune" -> ((s, dir) => {
      val tmp = graft.util.Scratch.dir("graft_part") + "/state"
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast(Dec152).as("o_price"), col("o_orderstatus"))
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(tmp)
      s.read.parquet(tmp)
        .where(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_price").cast(DoubleType).as("o_price"), col("o_orderstatus"))
    }),

    // JDBC connector round trip (reference load.py:29-48 + 229-246: the
    // PostgreSQL surface, embedded Derby standing in — url-swappable):
    // bulk write with bounded connections, then a PARTITIONED read back
    // (4 range slices on the key) feeding the summary aggregate. String
    // columns pin VARCHAR widths (Derby's default StringType mapping is
    // CLOB, which cannot be compared or merged on).
    "jdbc_roundtrip" -> ((s, dir) => {
      val url = s"jdbc:derby:${graft.util.Scratch.dir("graft_derby_rt")}/db;create=true"
      graft.io.Jdbc.writeTable(
        t(s, dir, "customer").select(col("c_custkey"), col("c_name"),
          col("c_acctbal"), col("c_mktsegment")),
        url, "customers", org.apache.spark.sql.SaveMode.Overwrite,
        columnTypes = Some("c_name VARCHAR(40), c_mktsegment VARCHAR(16)"))
      graft.io.Jdbc.readPartitioned(s, url, "customers", "c_custkey", 0L, 1L << 20, 4)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("c_acctbal").cast(Dec152)).cast(DoubleType).as("sum_bal"))
    }),

    // JDBC set-based MERGE upsert (reference load.py:87-161 with the
    // per-row conflict loop inverted to stage + one MERGE INTO): seed the
    // database with every third customer, upsert a batch touching every
    // second — matched rows update in place, new rows insert.
    "jdbc_merge_upsert" -> ((s, dir) => {
      val url = s"jdbc:derby:${graft.util.Scratch.dir("graft_derby_mu")}/db;create=true"
      val c = t(s, dir, "customer")
      graft.io.Jdbc.writeTable(
        c.where(pmod(col("c_custkey"), lit(3)) === 0)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal")),
        url, "cust_state", org.apache.spark.sql.SaveMode.Overwrite,
        columnTypes = Some("c_name VARCHAR(44)"))
      graft.io.Jdbc.mergeUpsert(s, url, "cust_state",
        c.where(pmod(col("c_custkey"), lit(2)) === 0)
          .select(col("c_custkey"), concat(col("c_name"), lit("_u")).as("c_name"),
            col("c_acctbal")),
        Seq("c_custkey"), Seq(col("c_custkey").desc),
        columnTypes = Some("c_name VARCHAR(44)"))
      graft.io.Jdbc.readTable(s, url, "cust_state")
    }),

    // ---- 2.10 streaming-equivalent batch windowing ------------------------
    // Tumbling 1-hour aggregate over the events table — the batch twin of
    // the Structured Streaming path in graft.streaming.
    "events_tumbling" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
        .select(col("window.start").as("hour_start"), col("event_type"),
          col("cnt"), col("sum_value"))),

    // REAL Structured Streaming execution in the gate (not just the batch
    // twin): file-stream source over the events table, watermarked
    // tumbling aggregate, AvailableNow trigger, parquet sink. Append mode
    // emits exactly the windows the final watermark (= max event time at
    // 0s delay) has closed, so the oracle is the batch aggregate minus
    // windows whose end is past the last event.
    "streaming_tumbling_live" -> ((s, dir) => {
      val ckpt = graft.util.Scratch.dir("graft_stream_ck")
      val out = graft.util.Scratch.dir("graft_stream_out") + "/agg"
      withShufflePartitions(s, 8) {
        val q = graft.streaming.EventStreams
          .tumblingAgg(Tables.eventsStream(s, dir), watermark = "0 seconds")
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", out).start()
        q.awaitTermination()
      }
      s.read.parquet(out)
        .select(col("hour_start"), col("event_type"), col("cnt"),
          col("sum_value").cast(DoubleType).as("sum_value"))
    }),

    // Sliding 2-hour windows on a 1-hour slide: each event lands in two
    // overlapping windows (streaming-compatible semantics in batch).
    "events_sliding" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("cnt"), col("sum_value"))),

    // Backward as-of join (SURVEY.md §7.6): each click gets the latest
    // prior purchase value of the same user. Single-shuffle union+window
    // form — no range explosion on hot keys.
    "asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("purchase_value"), col("event_id"))
      AsOf.asofJoinBackward(clicks, purchases, Seq("user_id"), "ts",
          Seq("purchase_value"), col("event_id"))
        .select(col("event_id"), col("user_id"), col("ts"), col("purchase_value"))
    }),

    // Forward as-of (merge_asof direction='forward'): each click gets the
    // EARLIEST following purchase value — same single-shuffle union+window
    // shape, mirrored ordering.
    "asof_join_forward" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("purchase_value"), col("event_id"))
      AsOf.asofJoinForward(clicks, purchases, Seq("user_id"), "ts",
          Seq("purchase_value"), col("event_id"))
        .select(col("event_id"), col("user_id"), col("ts"), col("purchase_value"))
    }),

    // merge_asof tolerance: the matched ROW is still the nearest prior
    // purchase; its carried value nulls out when that row is farther
    // than 10 minutes (the match travels as one struct, so the
    // tolerance gates the row the value came from — pandas semantics).
    "asof_join_tolerance" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("purchase_value"), col("event_id"))
      AsOf.asofJoinBackward(clicks, purchases, Seq("user_id"), "ts",
          Seq("purchase_value"), col("event_id"), toleranceMs = Some(10L * 60 * 1000))
        .select(col("event_id"), col("user_id"), col("ts"), col("purchase_value"))
    }),

    // Batch sessionization (the batch twin of streaming/EventStreams
    // .sessionize): gap > 30 min starts a session; lag + running sum of
    // start flags assigns session ids in two window passes over ONE
    // shuffle (same partitioning), then one aggregate.
    "events_sessionize" -> ((s, dir) => batchSessions(s, dir)),

    // SQL-surface parity: the same engine running `spark.sql` over temp
    // views (per-nation revenue by quarter — the flagship shape in SQL).
    "sql_revenue_rollup" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      t(s, dir, "nation").createOrReplaceTempView("nation_v")
      s.sql(
        """SELECT n_name,
          |  CAST(year(o_orderdate) AS STRING) || '-Q' || CAST(quarter(o_orderdate) AS STRING) AS quarter_label,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS revenue,
          |  count(*) AS order_cnt
          |FROM orders_v
          |JOIN customer_v ON o_custkey = c_custkey
          |JOIN nation_v ON c_nationkey = n_nationkey
          |GROUP BY 1, 2""".stripMargin)
    }),

    // Semi-structured JSON column (O-X11): parse events.props with a
    // declared schema (never schema inference at scale), aggregate on the
    // extracted field.
    "json_props_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("p", from_json(col("props"),
          StructType(Seq(StructField("k", LongType)))))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("p.k")).as("sum_k"),
          min(col("p.k")).as("min_k"),
          max(col("p.k")).as("max_k"))),

    // ---- text analysis ----------------------------------------------------
    "text_stats" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast(LongType).as("n_tokens"),
        TextAnalysis.subwordCount(col("text")).cast(LongType).as("n_subwords"))),

    "text_langid" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_guess"))),

    "text_quality" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        round(TextAnalysis.qualityScore(col("text")), 6).as("quality"))),

    "text_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          md5(concat_ws(" ", col("toks"))).as("fingerprint"),
          TextAnalysis.rollingFingerprintFromTokens(col("toks")).as("rolling_fp"))),

    // Exact top-k most frequent tokens (training-data vocabulary view):
    // explode -> count -> global top-k with deterministic tiebreak.
    // orderBy+limit compiles to TakeOrderedAndProject (map-side partial
    // top-k) — a partition-less Window here would funnel the ENTIRE
    // vocabulary (10^8+ tokens at web scale) through one task. Rank is
    // then derived window-free on the k survivors: rank = 1 + number of
    // rows sorting strictly before, via a broadcast self-join bounded at
    // k^2 = 400 comparisons regardless of corpus size.
    "text_top_tokens" -> ((s, dir) => {
      val counts = t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(explode(col("toks")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      val top = counts.orderBy(col("cnt").desc, col("token").asc).limit(20)
      val other = top.select(col("cnt").as("cnt2"), col("token").as("token2"))
      top.join(broadcast(other),
          col("cnt2") > col("cnt") ||
            (col("cnt2") === col("cnt") && col("token2") < col("token")),
          "left")
        .groupBy(col("token"), col("cnt"))
        .agg((count(col("token2")) + 1).cast(LongType).as("rank"))
    }),

    // Per-token document frequency + IDF (ln(N/df), rounded). Corpus
    // cardinality rides along as a broadcast 1-row aggregate — the whole
    // query is ONE lazy plan, no eager .count() driver action per call.
    "text_idf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = docs.agg(count(lit(1)).cast(DoubleType).as("n_docs"))
      docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), explode(array_distinct(col("toks"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(n))
        .withColumn("idf", round(log(col("n_docs") / col("df")), 6))
        .select(col("token"), col("df"), col("idf"))
    }),

    // Approximate distinct (the 100 TB variant of agg_distinct_users).
    // HLL sketches are engine-specific, so the gate emits the
    // DETERMINISTIC check — Spark's fixed HLL++ estimate (rsd 2%,
    // measured <=0.7% across the test SFs) within a 5% envelope of exact
    // — next to the exact count; the oracle's twin row is literal TRUE.
    "agg_approx_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"),
          (abs(col("approx_users") - col("exact_users")).cast(DoubleType) /
            col("exact_users").cast(DoubleType) <= 0.05).as("within_tol"),
          // 5%-wide error bucket: 0 whenever within_tol holds (gated on
          // the SAME predicate — a bare floor(ratio/0.05) is 1 at a ratio
          // of exactly 5%, contradicting within_tol's <=), so the gate
          // stays deterministic — but if a Spark upgrade ever moves the
          // HLL++ estimate out of tolerance, the mismatch dump shows HOW
          // far out (1 = 5-10%, 2 = 10-15%, ...) instead of an opaque
          // hash difference.
          when(abs(col("approx_users") - col("exact_users")).cast(DoubleType) /
            col("exact_users").cast(DoubleType) <= 0.05, lit(0L))
            .otherwise(floor(abs(col("approx_users") - col("exact_users")).cast(DoubleType) /
              col("exact_users").cast(DoubleType) / 0.05).cast(LongType))
            .as("err_bucket"),
          col("exact_users"))),

    // One-scan column profiling (ops/Profile): null/distinct/min/max per
    // column. Input pre-cast to decimal so min/max strings render
    // identically in both engines.
    "profile_orders" -> ((s, dir) =>
      graft.ops.Profile.columnProfile(
        t(s, dir, "orders").select(col("o_custkey"),
          col("o_totalprice").cast(Dec152).as("o_price"), col("o_orderstatus")),
        Seq("o_custkey", "o_price", "o_orderstatus"))),

    // Distribution-drift probe: exact per-group quantiles (both engines
    // use linear interpolation on the sorted values — bit-identical).
    "profile_quantiles" -> ((s, dir) =>
      graft.ops.Profile.quantiles(t(s, dir, "orders"), "o_totalprice",
          Seq("o_orderstatus"), Seq(0.25, 0.5, 0.75))
        .select(col("o_orderstatus"), col("prob"),
          round(col("q_value"), 6).as("q_value"))),

    // The 100 TB profiling variant: approx_percentile (t-digest,
    // map-side combinable — exact per-group sorts don't scale) graded
    // like agg_approx_distinct: the deterministic within-tolerance check
    // next to the exact value, plus a self-explaining error bucket.
    "profile_quantiles_approx" -> ((s, dir) => {
      val df = t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("approx_med"),
          percentile(col("o_totalprice"), lit(0.5)).as("exact_med"))
      // Zero-median guard: ANSI mode would throw DIVIDE_BY_ZERO on a
      // group whose exact median is 0 — grade it instead (equal -> in
      // tolerance, else maximally out).
      val rel = when(col("exact_med") =!= 0,
          abs(col("approx_med") - col("exact_med")) / col("exact_med"))
        .otherwise(when(col("approx_med") === col("exact_med"), lit(0.0))
          .otherwise(lit(1e18)))
      df.select(col("o_orderstatus"),
        (rel <= 0.01).as("within_tol"),
        when(rel <= 0.01, lit(0L))
          .otherwise(floor(rel / 0.01).cast(LongType)).as("err_bucket"),
        round(col("exact_med"), 6).as("exact_med"))
    }),

    // The composed training-data cleaning flow (text/CorpusPipeline):
    // language filter -> quality filter -> exact-dedup keeper ->
    // near-dup keeper, one lazy plan.
    "corpus_clean" -> ((s, dir) =>
      graft.text.CorpusPipeline.clean(t(s, dir, "documents"), "doc_id", "text",
        lang = "en", minQuality = 0.45, jaccardThreshold = 0.5, maxDocFreq = 100L)),

    // ---- dedup ------------------------------------------------------------
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactDuplicates(t(s, dir, "documents"), "doc_id", "text")),

    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 100L)),

    // Pairs -> whole-cluster dedup: every document labeled with the
    // smallest doc_id reachable through the Jaccard pair graph
    // (iterative min-label propagation; the oracle's recursive CTE
    // computes the same reachability fixpoint).
    "dedup_cluster_reps" -> ((s, dir) => docClusterReps(s, dir)),

    // Per-cluster CANONICAL selection: among a near-dup cluster, keep the
    // highest-quality copy (ties to the smallest id) — the keeper policy a
    // training pipeline wants when duplicates differ in extraction quality
    // (the rep id is a graph label, not a quality judgement). Quality is
    // the rounded text_quality score so the ordering is cross-engine
    // deterministic; top-1 per cluster compiles to WindowGroupLimit
    // (map-side partial rank, no full sort of the corpus).
    "dedup_canonical_quality" -> ((s, dir) => {
      val labeled = docClusterLabelTable(s, dir)
        .join(t(s, dir, "documents").select(col("doc_id"),
          round(TextAnalysis.qualityScore(col("text")), 6).as("quality")), Seq("doc_id"))
      graft.ops.Windows.topKPerGroup(labeled, Seq("rep"),
          Seq(col("quality").desc, col("doc_id").asc), k = 1)
        .select(col("rep"), col("doc_id").as("canonical_id"),
          col("quality").as("canonical_quality"))
    }),

    // Incremental ingestion dedup: the even-id half plays the ACCEPTED
    // corpus (its shingle index persisted to parquet and read back — the
    // state-table form a growing 100 TB corpus maintains), the odd-id
    // half arrives as the new batch. Pairs = batch-internal + batch vs
    // state-index; the historical corpus is never re-paired with itself.
    "dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // State construction (the accepted-corpus index a deployment
      // maintains) runs through StateSeed: fresh per call in Verify,
      // built once per JVM under the bench's seeded mode so reps time
      // the incremental fold, not fixture construction.
      val root = graft.util.StateSeed.root("graft_incdedup", dir) { root =>
        val st = Dedup.collapsedIndex(docs.where(pmod(col("doc_id"), lit(2)) === 0),
          "doc_id", "text", n = 3, maxDocFreq = 100L, hashFn = Dedup.Md5Hash60)
        // Persisted state = BOTH halves of the collapsed index.
        st.repIdx.write.parquet(root + "/rep_index")
        st.membership.write.parquet(root + "/membership")
      }
      val batch = Dedup.collapsedIndex(docs.where(pmod(col("doc_id"), lit(2)) =!= 0),
        "doc_id", "text", n = 3, maxDocFreq = 100L, hashFn = Dedup.Md5Hash60,
        cache = df => df.persist())
      Dedup.incrementalNearDupPairsCollapsed(batch,
          Dedup.CollapsedIndex(s.read.parquet(root + "/rep_index"),
            s.read.parquet(root + "/membership")),
          threshold = 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"), col("src"))
    }),

    // State-table COMPACTION transparency: the same incremental dedup,
    // but the persisted index is first fragmented the way a
    // thousand-wave ingest leaves it (48-way write => 48 small files per
    // table) and then compacted (ops/Compact: distributed rewrite + dir
    // swap). Oracle identical to dedup_incremental's — compaction may
    // only change file layout, never a row — and the file-count drop is
    // asserted inline so a no-op "compaction" fails loudly.
    "dedup_incremental_compacted" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val root = graft.util.StateSeed.root("graft_incdedup_c", dir) { root =>
        val st = Dedup.collapsedIndex(docs.where(pmod(col("doc_id"), lit(2)) === 0),
          "doc_id", "text", n = 3, maxDocFreq = 100L, hashFn = Dedup.Md5Hash60)
        st.repIdx.repartition(48).write.parquet(root + "/rep_index")
        st.membership.repartition(48).write.parquet(root + "/membership")
        Seq("/rep_index", "/membership").foreach { sub =>
          val stats = graft.ops.Compact.compactParquet(s, root + sub)
          require(stats.filesAfter < stats.filesBefore,
            s"compaction did not reduce $sub: $stats")
        }
      }
      val batch = Dedup.collapsedIndex(docs.where(pmod(col("doc_id"), lit(2)) =!= 0),
        "doc_id", "text", n = 3, maxDocFreq = 100L, hashFn = Dedup.Md5Hash60,
        cache = df => df.persist())
      Dedup.incrementalNearDupPairsCollapsed(batch,
          Dedup.CollapsedIndex(s.read.parquet(root + "/rep_index"),
            s.read.parquet(root + "/membership")),
          threshold = 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"), col("src"))
    }),

    // Incremental CONNECTED COMPONENTS: the label-maintenance twin of
    // dedup_incremental. State = the persisted CC label table over the
    // even-id history; the odd-id batch folds in via the CONTRACTED
    // graph (each incremental pair's endpoints mapped through their
    // prior labels, CC over {touched old reps} ∪ {batch ids} only,
    // relabel = two equi-joins) — O(batch + touched components)
    // regardless of history size. The oracle recomputes the fixpoint
    // over the SAME pair semantics (per-half hot caps, like
    // dedup_incremental's replica), so a hash match proves the
    // incremental fold equals a full recompute over history ∪ batch.
    "dedup_cluster_reps_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val batchDocs = docs.where(pmod(col("doc_id"), lit(2)) =!= 0)
      // State construction (a real deployment maintains these tables):
      // ONE collapsed index over the history half feeds both the
      // state-label CC (at representative grain, the dedup_cluster_reps
      // shape) and the incremental pair join; all three state tables
      // land on disk. Runs through StateSeed — fresh per call in
      // Verify, once per JVM under the bench's seeded mode, so bench
      // reps time the incremental fold, not history-state construction.
      val root = graft.util.StateSeed.root("graft_inccc", dir) { root =>
        val hist = docs.where(pmod(col("doc_id"), lit(2)) === 0)
        val hc = Dedup.exactCollapse(hist, "doc_id", "text", cache = df => df.persist())
        val hidx = Dedup.countedShingleIndexCollapsed(hc, n = 3, maxDocFreq = 100L,
          hashFn = Dedup.Md5Hash60).persist()
        val repLabels = Dedup.clusterRepresentatives(
          hc.reps.select(col("doc_id")), "doc_id",
          Dedup.ngramJaccardPairsFromIndex(hidx, threshold = 0.5),
          cache = df => df.persist())
        hc.membership
          .join(repLabels.select(col("doc_id").as("rep_id"), col("rep").as("_rl")), Seq("rep_id"))
          .join(hidx.select(col("doc_id").as("rep_id")).distinct()
            .withColumn("_survived", lit(true)), Seq("rep_id"), "left")
          .select(col("doc_id"),
            when(col("_survived") || col("doc_id") === col("rep_id"), col("_rl"))
              .otherwise(col("doc_id")).as("rep"))
          .write.parquet(root + "/labels")
        hidx.write.parquet(root + "/rep_index")
        hc.membership.write.parquet(root + "/membership")
      }
      // The incremental fold: batch pairs only (self + vs state index),
      // batch side pre-contracted through its exact-dup membership so
      // the fold iterates over unique batch texts. State comes from the
      // persisted tables — the form a growing corpus actually reads.
      val st = Dedup.CollapsedIndex(s.read.parquet(root + "/rep_index"),
        s.read.parquet(root + "/membership"))
      val batch = Dedup.collapsedIndex(batchDocs, "doc_id", "text",
        n = 3, maxDocFreq = 100L, hashFn = Dedup.Md5Hash60,
        cache = df => df.persist())
      Dedup.clusterRepresentativesIncrementalCollapsed(
        s.read.parquet(root + "/labels"),
        batch.membership.select(col("doc_id"), col("rep_id")),
        Dedup.incrementalNearDupPairsCollapsed(batch, st, threshold = 0.5),
        cache = df => df.persist())
    }),

    // The incremental dedup run as a LIVE stream: two document waves
    // (even ids first, then odd) through a file stream; each micro-batch
    // dedups against the persisted accepted-corpus index and appends its
    // survivors (streaming/EventStreams.corpusDedupSink). Output: every
    // accepted doc with the wave that admitted it.
    "streaming_dedup_incremental_live" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val waveDir = Tables.stageWaves(s, docs, pmod(col("doc_id"), lit(2)), 2, "graft_incw")
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(waveDir)
      val statePath = graft.util.Scratch.dir("graft_incw_state") + "/index"
      val acceptedPath = graft.util.Scratch.dir("graft_incw_acc") + "/accepted"
      val ckpt = graft.util.Scratch.dir("graft_incw_ck")
      withShufflePartitions(s, 8) {
        graft.streaming.EventStreams.corpusDedupSink(stream, "doc_id", "text",
          statePath, acceptedPath, ckpt).awaitTermination()
      }
      s.read.parquet(acceptedPath)
    }),

    // Streaming cluster-label maintenance: the LIVE twin of
    // dedup_cluster_reps_incremental. The same two waves (evens, then
    // odds) flow through corpusLabelSink — wave 0 with empty state is a
    // full CC over the history half, wave 1 folds the batch through the
    // contracted graph and writes only the batch + changed-label rows.
    // The reconstructed latest-delta-per-doc labeling must hash-match
    // the SAME full-recompute fixpoint oracle as the batch gate.
    "streaming_cluster_labels_live" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val waveDir = Tables.stageWaves(s, docs, pmod(col("doc_id"), lit(2)), 2, "graft_lblw")
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(waveDir)
      val statePath = graft.util.Scratch.dir("graft_lblw_state") + "/index"
      val labelsPath = graft.util.Scratch.dir("graft_lblw_lbl") + "/labels"
      val ckpt = graft.util.Scratch.dir("graft_lblw_ck")
      withShufflePartitions(s, 8) {
        graft.streaming.EventStreams.corpusLabelSink(stream, "doc_id", "text",
          statePath, labelsPath, ckpt).awaitTermination()
      }
      graft.ops.Windows.topKPerGroup(s.read.parquet(labelsPath),
          Seq("doc_id"), Seq(col("wave").desc), k = 1)
        .select(col("doc_id"), col("rep"))
    }),

    // The SAME ingest killed mid-run and restarted: an injected failure
    // in wave 1 lands at the worst point — the accepted wave is already
    // committed, the index waves are not — then a second run from the
    // unchanged checkpoint REPLAYS wave 1 (foreachBatch is
    // at-least-once). The replay-safe sink (wave-keyed dynamic
    // overwrite, state reads excluding the current wave) must converge
    // to the identical accepted set: the oracle is the same as the
    // uninterrupted run's.
    "streaming_dedup_restart" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val waveDir = Tables.stageWaves(s, docs, pmod(col("doc_id"), lit(2)), 2, "graft_rsw")
      def stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(waveDir)
      val statePath = graft.util.Scratch.dir("graft_rsw_state") + "/index"
      val acceptedPath = graft.util.Scratch.dir("graft_rsw_acc") + "/accepted"
      val ckpt = graft.util.Scratch.dir("graft_rsw_ck")
      val tripped = new java.util.concurrent.atomic.AtomicBoolean(false)
      val chaos: Long => Unit = b =>
        if (b == 1L && tripped.compareAndSet(false, true))
          throw new RuntimeException(
            "injected: accepted wave committed, index waves lost")
      withShufflePartitions(s, 8) {
        val q1 = graft.streaming.EventStreams.corpusDedupSink(stream, "doc_id",
          "text", statePath, acceptedPath, ckpt, chaosAfterAccept = chaos)
        try { q1.awaitTermination(); throw new IllegalStateException(
          "streaming_dedup_restart: the injected failure never fired")
        } catch {
          case e: org.apache.spark.sql.streaming.StreamingQueryException
            if e.getMessage.contains("injected") => () // the planned crash
        }
        graft.streaming.EventStreams.corpusDedupSink(stream, "doc_id", "text",
          statePath, acceptedPath, ckpt, chaosAfterAccept = chaos)
          .awaitTermination()
      }
      s.read.parquet(acceptedPath)
    }),

    // Sketch-based near-dup. Gate configuration uses the md5-derived
    // 60-bit term hash (Dedup.Md5Hash60) so DuckDB can replicate the
    // MinHash signatures, banding, and verification EXACTLY; production
    // default stays xxhash64.
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minHashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 100L, hashFn = Dedup.Md5Hash60)),

    // Same md5-hash gate trick; 60-bit width (4x15-bit bands) keeps every
    // shift inside positive BIGINT range on both engines.
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simHashPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3,
          hashFn = Dedup.Md5Hash60, bits = 60)
        .select(col("doc_a"), col("doc_b"), col("hamming").cast(LongType).as("hamming"))),

    // ---- similarity search ------------------------------------------------
    "sim_brute_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb.where(col("vec_id") < 8), emb, "vec_id", "embedding", 5)
        .select(col("query_id"), col("rank").cast(LongType).as("rank"),
          col("neighbor_id"), round(col("sim"), 6).as("sim"))
    }),

    // Same semantics through the bounded-heap TypedImperativeAggregate:
    // map-side partial top-k, exchange carries k pairs per query instead
    // of the whole scored corpus. Shares sim_brute_topk's oracle.
    "sim_brute_topk_agg" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopKAgg(emb.where(col("vec_id") < 8), emb, "vec_id", "embedding", 5)
        .select(col("query_id"), col("rank").cast(LongType).as("rank"),
          col("neighbor_id"), round(col("sim"), 6).as("sim"))
    }),

    "sim_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb.where(col("vec_id") < 8), emb, "vec_id", "embedding",
          "label", k = 5, nprobe = 3)
        .select(col("query_id"), col("rank").cast(LongType).as("rank"),
          col("neighbor_id"), round(col("sim"), 6).as("sim"))
    }),

    // Bulk-labeling IVF path: probe set too big to broadcast (corpus-as-
    // queries), so it shuffles and equi-joins on centroid_id instead.
    // Same semantics, same oracle — only the join strategy differs (both
    // shapes pinned in PlanContractSpec).
    "sim_ivf_topk_bulk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb.where(col("vec_id") < 8), emb, "vec_id", "embedding",
          "label", k = 5, nprobe = 3, broadcastProbes = false)
        .select(col("query_id"), col("rank").cast(LongType).as("rank"),
          col("neighbor_id"), round(col("sim"), 6).as("sim"))
    }),

    // Two-tier quantized search: int8-code recall tier (4x less data per
    // comparison), exact float rescore of k*4 candidates — the shape a
    // 100 TB vector corpus actually ships. Codes, approx ranks and the
    // rescore are all replicated exactly by the oracle.
    "sim_quantized_rescore" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.quantizedTopK(emb.where(col("vec_id") < 8), emb, "vec_id",
          "embedding", k = 5, rescoreFactor = 4)
        .select(col("query_id"), col("rank").cast(LongType).as("rank"),
          col("neighbor_id"), round(col("sim"), 6).as("sim"))
    }),

    // Embedding-cosine near-dup: exact O(n^2) tier with a brute-force
    // DuckDB twin; norms precomputed per vector, not per pair.
    "dedup_embedding" -> ((s, dir) =>
      Similarity.nearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding", 0.45)
        .select(col("doc_a"), col("doc_b"), round(col("sim"), 6).as("sim"))),

    // LSH-bucketed variant: candidates share a hyperplane bucket in any of
    // three seeded hash tables (multi-table LSH — the production recall
    // knob; measured recall ~3x the single-table form), verified exactly.
    "dedup_embedding_lsh" -> ((s, dir) =>
      Similarity.lshNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
          dim = 64, threshold = 0.45, nbits = 4, seeds = lshSeeds)
        .select(col("doc_a"), col("doc_b"), round(col("sim"), 6).as("sim"))),

    // Vector twin of dedup_incremental: the even-id half's LSH bucket
    // table persisted as the accepted-corpus state, odd ids arriving as
    // the batch — new vectors near-dup-checked against history without
    // ever re-pairing history.
    "dedup_embedding_incremental" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val root = graft.util.StateSeed.root("graft_incvec", dir) { root =>
        Similarity.lshBucketTable(emb.where(pmod(col("vec_id"), lit(2)) === 0),
            "vec_id", "embedding", dim = 64, nbits = 4, seeds = lshSeeds)
          .write.parquet(root + "/buckets")
      }
      Similarity.incrementalLshNearDup(emb.where(pmod(col("vec_id"), lit(2)) =!= 0),
          s.read.parquet(root + "/buckets"), "vec_id", "embedding",
          dim = 64, threshold = 0.45, nbits = 4, seeds = lshSeeds)
        .select(col("doc_a"), col("doc_b"), round(col("sim"), 6).as("sim"), col("src"))
    }),

    // ---- recall audits for the approximate tiers --------------------------
    // One-row reports: recall of each approximate tier vs its exact twin,
    // integer-count arithmetic only (deterministic under any partitioning).
    // The oracle replicates the VALUE but hard-codes meets_floor = TRUE,
    // so a parameter change that silently tanks recall flips the Spark row
    // false and the gate red (the agg_approx_distinct tripwire pattern).
    // Floors sit ~60% of measured recall at the test SFs: a real
    // regression (halved recall) trips them; SF-to-SF noise does not.
    // (IVF measured 0.33-0.43 — nprobe 3 of 10 cells whose labels are NOT
    // learned clusters, so ~nprobe/ncells is the intrinsic ceiling here.)
    "recall_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 8)
      Recall.topKRecall(
        Similarity.ivfTopK(q, emb, "vec_id", "embedding", "label", k = 5, nprobe = 3),
        Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5),
        k = 5, floor = 0.2)
    }),

    "recall_quantized_rescore" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 8)
      Recall.topKRecall(
        Similarity.quantizedTopK(q, emb, "vec_id", "embedding", k = 5, rescoreFactor = 4),
        Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5),
        k = 5, floor = 0.6)
    }),

    "recall_embedding_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Recall.pairRecall(
        Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
          dim = 64, threshold = 0.45, nbits = 4, seeds = lshSeeds),
        Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.45),
        floor = 0.3)
    }),

    // The audit form that RUNS at 100 TB: the exact tier is O(n²), so the
    // full audit above is only runnable at test scale. Hyperplane-LSH
    // candidacy is a property of the PAIR alone (the two vectors' sign
    // patterns against fixed planes — bucket collision never depends on
    // the rest of the corpus), so recall measured over a deterministic
    // hash-sample of vectors is an unbiased estimate of full-corpus
    // recall, while the exact tier's cost falls quadratically (a 50%
    // sample pays 1/4 the pairs). md5 bucket so DuckDB replicates the
    // sample membership bit-for-bit.
    "recall_embedding_lsh_sampled" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .where(graft.ops.Sampling.hashBucket(col("vec_id"), Dedup.Md5Hash60) < 5000)
      Recall.pairRecall(
        Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
          dim = 64, threshold = 0.45, nbits = 4, seeds = lshSeeds),
        Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.45),
        floor = 0.3)
    }),

    "recall_minhash_lsh" -> ((s, dir) => {
      // ONE exact-collapsed shingle index feeds both tiers (the approx
      // tier's signature + verify sides AND the exact twin's self-join) —
      // the audit previously re-tokenized and re-indexed the corpus per
      // tier, costing ~2x the op it audits. Exact pairs are
      // hash-independent (candidates are verified by true Jaccard), so
      // sharing the Md5Hash60 index with the exact side changes nothing;
      // both tiers expand through the same membership, so the recall
      // ratio is the document-level ratio the oracle replicates.
      val c = Dedup.exactCollapse(t(s, dir, "documents"), "doc_id", "text",
        cache = df => df.persist())
      val idx = Dedup.countedShingleIndexCollapsed(c, n = 3, maxDocFreq = 100L,
        hashFn = Dedup.Md5Hash60).persist()
      Recall.pairRecall(
        Dedup.expandExactGroups(Dedup.minHashLshPairsFromIndex(idx, threshold = 0.5),
          c.membership, "jaccard", idx, lit(1.0)),
        Dedup.expandExactGroups(Dedup.ngramJaccardPairsFromIndex(idx, threshold = 0.5),
          c.membership, "jaccard", idx, lit(1.0)),
        floor = 0.5)
    }),

    // Text twin of recall_embedding_lsh_sampled — the audit form that runs
    // at corpus scale. A doc's MinHash signature depends only on its own
    // shingles, and banding collision only on the two signatures, so pair
    // candidacy is pair-local and sample recall estimates full-corpus
    // recall; the one corpus-dependent knob (the hot-shingle cap) is
    // shared by BOTH tiers through the one collapsed index, so the ratio
    // stays internally consistent. Exact-tier cost falls quadratically
    // with the sample rate.
    "recall_minhash_lsh_sampled" -> ((s, dir) => {
      val c = Dedup.exactCollapse(
        t(s, dir, "documents")
          .where(graft.ops.Sampling.hashBucket(col("doc_id"), Dedup.Md5Hash60) < 5000),
        "doc_id", "text", cache = df => df.persist())
      val idx = Dedup.countedShingleIndexCollapsed(c, n = 3, maxDocFreq = 100L,
        hashFn = Dedup.Md5Hash60).persist()
      Recall.pairRecall(
        Dedup.expandExactGroups(Dedup.minHashLshPairsFromIndex(idx, threshold = 0.5),
          c.membership, "jaccard", idx, lit(1.0)),
        Dedup.expandExactGroups(Dedup.ngramJaccardPairsFromIndex(idx, threshold = 0.5),
          c.membership, "jaccard", idx, lit(1.0)),
        floor = 0.5)
    }),

    // The custom codegen'd expression through the SQL surface: graft_dot
    // registered on the session, invoked from spark.sql in the graded gate.
    "sql_graft_dot" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      t(s, dir, "embeddings").createOrReplaceTempView("embeddings_v")
      s.sql(
        """SELECT vec_id, round(graft_dot(embedding, embedding), 6) AS self_dot
          |FROM embeddings_v WHERE vec_id < 100""".stripMargin)
    }),

    // ---- S1: per-symbol REST extract as a real DataSourceV2 ---------------
    // graft.sources.FmpSource: one input partition per symbol, required-
    // column pruning into the record parser, symbol predicates consumed as
    // partition pruning (the TK4 fetch below never happens). Transport is
    // file-backed (no egress in this container); the staged JSONL per
    // sym_part directory is the fixture standing in for the HTTP body.
    "source_http_dsv2" -> ((s, dir) => {
      val root = graft.util.Scratch.dir("graft_fmp_api")
      incomeBronzeFixture(s, dir, badDates = false)
        .withColumn("sym_part", col("symbol"))
        .write.partitionBy("sym_part").mode("overwrite")
        .json(root + "/income-statement")
      s.read.format("graft.sources.FmpSource")
        .option("root", root).option("endpoint", "income-statement")
        .option("symbols", "TK0,TK1,TK2,TK3,TK4")
        .option("dataset", "income").load()
        .where(col("symbol").isin("TK0", "TK1", "TK2", "TK3"))
        .select(col("date"), col("symbol"), col("revenue"), col("eps"))
    }),

    // The same extract through a REAL socket: a loopback JDK HttpServer
    // serves the staged JSONL as JSON arrays, the source issues one GET
    // per un-pruned symbol from the executors, and the server 500s the
    // FIRST request to every path — so each partition's first attempt
    // fails and the reader's retry recovers it. Materialized while the
    // server is up (the gate returns a read-back, not a lazy plan over a
    // stopped socket); same oracle as the file transport.
    "source_http_live" -> ((s, dir) => {
      val root = graft.util.Scratch.dir("graft_fmp_http")
      val out = graft.util.Scratch.dir("graft_fmp_http_out") + "/rows"
      incomeBronzeFixture(s, dir, badDates = false)
        .withColumn("sym_part", col("symbol"))
        .write.partitionBy("sym_part").mode("overwrite")
        .json(root + "/income-statement")
      val server = new graft.sources.LoopbackApiServer(root, failFirst = true)
      try {
        s.read.format("graft.sources.FmpSource")
          .option("url", server.url).option("endpoint", "income-statement")
          .option("symbols", "TK0,TK1,TK2,TK3,TK4")
          .option("dataset", "income").load()
          .where(col("symbol").isin("TK0", "TK1", "TK2", "TK3"))
          .select(col("date"), col("symbol"), col("revenue"), col("eps"))
          .write.mode("overwrite").parquet(out)
      } finally server.stop()
      s.read.parquet(out)
    }),

    // ---- multimodal: REAL codecs ------------------------------------------
    // JDK-native decoders (javax.imageio / javax.sound.sampled) behind the
    // same mapPartitions plumbing as the declared stubs: the fixture
    // encodes deterministic pattern payloads (PNG for even ids, JPEG for
    // odd; PCM16 WAV for audio) and the gates verify what the REAL
    // decoder reads back — dimensions + container format for both image
    // codecs, exact pixel-lane sums for the lossless PNG tier, decoded
    // geometry for resize, and format fields + the exact PCM sample sum
    // for audio — all replicated analytically by the oracle.
    "multimodal_decode_real" -> ((s, dir) => {
      val fix = graft.multimodal.ImageCodec.encodeFixture(
        t(s, dir, "documents").select(col("doc_id")), "doc_id")
      graft.multimodal.ImageCodec.decodeImageMeta(fix, "doc_id", "image")
        .select(col("doc_id"), col("width"), col("height"), col("format"))
    }),

    "multimodal_features_real" -> ((s, dir) => {
      val fix = graft.multimodal.ImageCodec.encodeFixture(
        t(s, dir, "documents").select(col("doc_id"))
          .where(col("doc_id") % 2 === 0), "doc_id") // PNG tier: lossless
      graft.multimodal.ImageCodec.pixelLaneSums(fix, "doc_id", "image", dim = 8)
        .select(col("doc_id") +:
          (0 until 8).map(j => col("features")(j).as(s"f$j")): _*)
    }),

    "multimodal_resize_real" -> ((s, dir) => {
      val fix = graft.multimodal.ImageCodec.encodeFixture(
        t(s, dir, "documents").select(col("doc_id")), "doc_id")
      graft.multimodal.ImageCodec.resizeHalf(fix, "doc_id", "image")
        .select(col("doc_id"), col("resized_width"), col("resized_height"),
          (col("resized_bytes") > 0).as("has_payload"))
    }),

    "multimodal_audio_meta" -> ((s, dir) => {
      val fix = graft.multimodal.AudioCodec.encodeFixture(
        t(s, dir, "documents").select(col("doc_id")), "doc_id")
      graft.multimodal.AudioCodec.decodeAudioMeta(fix, "doc_id", "audio")
    }),

    // REAL multi-frame sampling over animated GIF (the one JDK-native
    // multi-frame container): open the clip, count frames with the codec,
    // decode every 2nd frame, reduce to dims + exact gray sum — retires
    // the synthetic byte-slicing tier as the only frame-sampling path.
    "multimodal_frames_real" -> ((s, dir) => {
      val fix = graft.multimodal.ImageCodec.encodeGifFixture(
        t(s, dir, "documents").select(col("doc_id")), "doc_id")
      graft.multimodal.ImageCodec.sampleGifFrames(fix, "doc_id", "video", stride = 2)
    }),

    // ---- multimodal (plumbing stubs) --------------------------------------
    // Binary payload plumbing: utf-8 bytes of the text stand in for an
    // opaque media payload; fixed-stride frame sampling + per-frame hash.
    "multimodal_frames" -> ((s, dir) => {
      val withBin = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      BinaryOps.sampleFrames(withBin, "doc_id", "payload", frameBytes = 32)
        .select(col("doc_id"), col("frame_idx").cast(LongType).as("frame_idx"),
          col("frame_hash"))
    }),

    // STUB decode via mapPartitions: the fake dimensions are a pure
    // function of the payload byte length, so DuckDB replicates them from
    // strlen(text). Int32 fields cast to long at the gate surface (driver
    // dtype canonicalization).
    "multimodal_decode_meta" -> ((s, dir) => {
      val withBin = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      BinaryOps.decodeImageMeta(s, withBin, "doc_id", "payload")
        .select(col("doc_id"), col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"), col("format"), col("n_bytes"))
    }),

    // STUB feature-extract + resize plumbing: binary -> fixed-width float
    // vector; binary -> stride-sampled binary. The gate emits a DIGEST of
    // the vector (md5 over the exact integer lane values — a raw
    // array<float> is unhashable for the driver's pandas sorter); the
    // array-valued API stays in the library.
    "multimodal_features" -> ((s, dir) => {
      val withBin = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val feats = BinaryOps.extractFeatures(withBin, "doc_id", "payload", dim = 8)
      val resized = BinaryOps.resizePayload(withBin, "doc_id", "payload", stride = 4)
      feats.join(resized, "doc_id")
        .select(col("doc_id"),
          md5(concat_ws(",",
            transform(col("features"), f => f.cast(IntegerType).cast(StringType))))
            .as("features_md5"),
          col("orig_bytes"),
          length(col("resized")).cast(LongType).as("resized_bytes"))
    }),

    // ---- spec-only operators, now driver-gated ----------------------------
    // O-P3 Python-truthiness key coalesce (transform.py:82): null, empty
    // string AND numeric zero all fall through to the fallback.
    "fn_coalesce_truthy" -> ((s, dir) => {
      val m = pmod(col("o_orderkey"), lit(4))
      val a = when(m === 0, lit(null).cast(StringType))
        .when(m === 1, lit(""))
        .when(m === 2, lit("0"))
        .otherwise(col("o_totalprice").cast(Dec152).cast(StringType))
      t(s, dir, "orders")
        .select(col("o_orderkey"), a.as("primary_key"))
        .select(col("o_orderkey"),
          Normalize.coalesceKeyTruthy(col("primary_key"), lit("fallback")).as("chosen"))
    }),

    // O-F3 quarantine split (transform.py:98-100): bad rows counted and
    // kept inspectable, never dropped silently.
    "quality_quarantine" -> ((s, dir) => {
      val labeled = t(s, dir, "orders").select(col("o_orderkey"),
        when(pmod(col("o_orderkey"), lit(5)) === 0, lit("bad-label"))
          .otherwise(Normalize.quarterLabel(col("o_orderdate"))).as("quarter_label"),
        when(pmod(col("o_orderkey"), lit(7)) === 0, lit(""))
          .otherwise(col("o_orderpriority")).as("ticker"))
      val valid = Quality.labelValid(col("quarter_label")) && Quality.tickerValid(col("ticker"))
      val (clean, bad) = Quality.quarantine(labeled, valid)
      clean.select(lit("clean").as("bucket"))
        .unionByName(bad.select(lit("quarantine").as("bucket")))
        .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    }),

    // O-M4 updated_at touch shape: the merged row is "touched" iff the
    // winner came from the incoming batch (the reference stamps
    // updated_at exactly then; the timestamp itself is nondeterministic,
    // so the gate checks the boolean that drives it).
    "merge_touched" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(
        col("user_id"), col("event_type"), col("event_id"), col("ts"), col("value"))
      val current = ev.where(pmod(col("event_id"), lit(2)) === 0).withColumn("_batch", lit(0))
      val incoming = ev.where(pmod(col("event_id"), lit(2)) === 1).withColumn("_batch", lit(1))
      Merge.mergeUpsert(current, incoming, Seq("user_id", "event_type"),
          Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("event_type"), col("event_id"),
          (col("_batch") === 1).as("touched"))
    }),

    // O-X7 ticker-length validation (config.py:82).
    "fn_ticker_valid" -> ((s, dir) => {
      val tk = when(pmod(col("o_orderkey"), lit(3)) === 0, lit(""))
        .when(pmod(col("o_orderkey"), lit(3)) === 1, lit("VERYLONGTICKER"))
        .otherwise(col("o_orderpriority"))
      t(s, dir, "orders").select(tk.as("ticker"))
        .groupBy(Quality.tickerValid(col("ticker")).as("valid"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // O-X10 default-name synthesis (load.py:55-69:
    // company_names.get(ticker, f'{ticker} Inc')).
    "fn_name_default" -> ((s, dir) =>
      t(s, dir, "nation").select(col("n_nationkey"), col("n_name"),
        Normalize.nameFor(col("n_name"),
          Map("NATION_1" -> "First Nation Motors")).as("company_name"))),

    // O-A5 pipeline metrics: the QueryExecutionListener observes a real
    // action; the gate checks the deterministic parts (an action was
    // captured with a non-negative duration) next to the action's result.
    "metrics_listener" -> ((s, dir) => {
      val rec = graft.ops.Metrics.attach(s)
      try {
        val nGroups = t(s, dir, "orders")
          .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt")).count()
        rec.awaitQuiesce(s)
        val ms = rec.metrics
        val captured = ms.nonEmpty && ms.forall(_.durationMs >= 0)
        import s.implicits._
        Seq((captured, nGroups)).toDF("captured", "n_groups")
      } finally rec.detach(s)
    }),

    // ---- S2/S6 + O-P1..P4 + O-X1..X4 composite: bronze JSON fixture ->
    // bronze sink -> schema-declared re-ingest -> full income
    // normalization. Decimals surface as DOUBLE per the gate contract.
    "pipeline_income_normalize" -> ((s, dir) => {
      val tmp = graft.util.Scratch.dir("graft_bronze_inc")
      incomeBronzeFixture(s, dir, badDates = false)
        .write.mode("overwrite").json(tmp) // S6 bronze sink
      val back = s.read.schema(graft.model.Schemas.fmpIncome).json(tmp) // S2 scan
      Pipeline.normalizeIncome(back).select(
        col("ticker"), col("quarter_date"), col("quarter_label"),
        col("revenue").cast(DoubleType).as("revenue"),
        col("eps").cast(DoubleType).as("eps"),
        col("gross_profit").cast(DoubleType).as("gross_profit"))
    }),

    // ---- S3/S11: the analyst-estimates flow over its own schema.
    "pipeline_estimates_normalize" -> ((s, dir) => {
      val m = pmod(col("o_orderkey"), lit(4))
      val numS = col("o_totalprice").cast(Dec152).cast(StringType)
      val bronze = t(s, dir, "orders").where(col("o_orderkey") < 2000).select(
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("date"),
        concat(lit("TK"), pmod(col("o_orderkey"), lit(5)).cast(StringType)).as("symbol"),
        numS.as("estimatedRevenueAvg"),
        when(m === 0, lit("bogus")).otherwise(numS).as("estimatedEpsAvg"),
        when(m === 1, lit("-3")).otherwise(lit("7")).as("numberAnalystsEstimatedRevenue"))
      val tmp = graft.util.Scratch.dir("graft_bronze_est")
      bronze.write.mode("overwrite").json(tmp)
      val back = s.read.schema(graft.model.Schemas.fmpEstimates).json(tmp)
      Pipeline.normalizeEstimates(back).select(
        col("ticker"), col("quarter_date"), col("quarter_label"),
        col("estimated_revenue").cast(DoubleType).as("estimated_revenue"),
        col("estimated_eps").cast(DoubleType).as("estimated_eps"),
        col("analyst_count").cast(LongType).as("analyst_count"))
    }),

    // ---- S9/S13/S14 end-to-end: Pipeline.run — quarantine split, merge
    // into Parquet state (atomic swap), read-back. Unparseable-date rows
    // (m==1) are quarantined; the state table is the deduped remainder.
    "pipeline_run_state" -> ((s, dir) => {
      val tmpJ = graft.util.Scratch.dir("graft_bronze_run")
      incomeBronzeFixture(s, dir, badDates = true)
        .write.mode("overwrite").json(tmpJ)
      val tmpS = graft.util.Scratch.dir("graft_state_run") + "/state"
      val (state, _) = Pipeline.run(s, tmpJ, tmpS)
      state.select(
        col("ticker"), col("quarter_date"), col("quarter_label"),
        col("revenue").cast(DoubleType).as("revenue"),
        col("eps").cast(DoubleType).as("eps"),
        col("gross_profit").cast(DoubleType).as("gross_profit"))
    }),

    // ---- deterministic sampling / splits ----------------------------------
    // Hash-based train/val/test assignment (ops/Sampling): stable under
    // retries, repartitioning and engine version — rand()-based splits are
    // none of those. Gate uses the md5 hash so DuckDB replicates the
    // buckets exactly.
    "sample_hash_split" -> ((s, dir) =>
      graft.ops.Sampling.hashSplit(
          t(s, dir, "documents").select(col("doc_id")), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          hashFn = Dedup.Md5Hash60)
        .select(col("doc_id"), col("split"))),

    // LEAKAGE-SAFE split: hash-split by NEAR-DUP CLUSTER, not by document.
    // A per-doc split quietly places near-duplicates of training documents
    // in the eval set (train/test contamination); splitting on the cluster
    // representative keeps every member of a near-dup cluster — and every
    // exact copy — on the same side of the wall. Same pair-graph fixpoint
    // as dedup_cluster_reps, same md5 bucket as sample_hash_split, so the
    // oracle replicates both stages exactly.
    "sample_split_leakage_safe" -> ((s, dir) =>
      graft.ops.Sampling.hashSplit(docClusterLabelTable(s, dir), "rep",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          hashFn = Dedup.Md5Hash60)
        .select(col("doc_id"), col("rep"), col("split"))),

    // Deterministic data MIXING: the largest sample whose composition
    // matches the target weights (binding group kept whole, others
    // hash-thresholded down to their share).
    "sample_mixture" -> ((s, dir) =>
      graft.ops.Sampling.mixtureSample(
          t(s, dir, "documents").select(col("doc_id"), col("source")),
          "doc_id", "source", MixtureTargets, hashFn = Dedup.Md5Hash60)
        .select(col("doc_id"), col("source"))),

    // Per-stratum deterministic sampling (corpus mixing weights as one
    // scan-side filter).
    "sample_stratified" -> ((s, dir) =>
      graft.ops.Sampling.stratifiedHashSample(
          t(s, dir, "documents").select(col("doc_id"), col("lang")), "doc_id", "lang",
          Map("en" -> 1.0, "zh" -> 0.5), defaultRate = 0.25,
          hashFn = Dedup.Md5Hash60)
        .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))),

    // Corpus-safety pattern density (PII/boilerplate signals) as pure
    // scan-side regex counts.
    "text_pattern_counts" -> ((s, dir) => {
      val counts = TextAnalysis.FilterPatterns.map { case (name, p) =>
        TextAnalysis.patternCount(col("text"), p).cast(LongType).as(s"n_$name")
      }
      t(s, dir, "documents").select(col("doc_id") +: counts: _*)
    }),

    // PII redaction: the corpus carries no PII, so both engines append the
    // same synthetic email/URL/digit-run suffix, then redact with the
    // FilterPatterns chain in list order. Pure scan-side projection.
    "text_redact" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast(StringType),
            lit("@example.com via https://www.Example"),
            col("doc_id").cast(StringType),
            lit(".com/a id 90000"), col("doc_id").cast(StringType)).as("text"))
        .select(col("doc_id"), TextAnalysis.redact(col("text")).as("redacted"))),

    // Per-domain provenance accounting: extract+normalize every URL host
    // (deterministic synthetic URLs appended — the corpus has none), one
    // row per occurrence. Scan-side regex, explode, no shuffle.
    "text_url_hosts" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            lit(" see https://www.Mirror"),
            pmod(col("doc_id"), lit(7)).cast(StringType),
            lit(".net/x and http://cdn"),
            pmod(col("doc_id"), lit(3)).cast(StringType),
            lit(".example.org:8080/y")).as("text"))
        .select(col("doc_id"),
          posexplode(TextAnalysis.urlHosts(col("text"))).as(Seq("url_idx", "host")))
        .select(col("doc_id"), col("url_idx").cast(LongType).as("url_idx"),
          col("host"))),

    // Overlapping token-window chunking (size 32, stride 16) for
    // context-window packing / RAG indexing; chunk content surfaces as an
    // md5 digest (the driver's hasher can't sort raw arrays).
    "text_chunks" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(TextAnalysis.overlappingChunks(col("toks"), 32, 16)).as("c"))
        .select(col("doc_id"),
          col("c.chunk_idx").cast(LongType).as("chunk_idx"),
          size(col("c.chunk_toks")).cast(LongType).as("n_toks"),
          md5(concat_ws(" ", col("c.chunk_toks"))).as("chunk_digest"))),

    // C4/CCNet boilerplate-line removal over a synthetic page fixture
    // (nav/footer/unsubscribe lines shared across >=10 docs are stripped;
    // each doc's own text line survives).
    "text_remove_boilerplate" -> ((s, dir) =>
      Dedup.removeBoilerplateLines(
        t(s, dir, "documents").select(col("doc_id"),
          concat_ws("\n",
            concat(lit("nav: "), col("source")),
            col("text"),
            concat(lit("(c) footer "), col("lang")),
            lit("unsubscribe here")).as("text")),
        "doc_id", "text", minDocFreq = 10)),

    // Benchmark decontamination: exact-fingerprint matches of a benchmark
    // set (doc_id % 10 == 0 stands in) against the full corpus.
    "contamination_report" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.contaminationReport(docs, "doc_id", "text",
        docs.where(pmod(col("doc_id"), lit(10)) === 0), "doc_id", "text")
    }),

    // ---- S5 wide->long / long->wide ---------------------------------------
    // S5 unpivot (reference extract.py:158-187): the yfinance metric
    // matrix melted to per-metric rows. Expand-based — no shuffle.
    "unpivot_wide_long" -> ((s, dir) =>
      Reshape.unpivotToLong(
        t(s, dir, "orders").select(col("o_orderkey"),
          col("o_totalprice").cast(DoubleType).as("m_totalprice"),
          col("o_custkey").cast(DoubleType).as("m_custkey")),
        Seq("o_orderkey"), Seq("m_totalprice", "m_custkey"))),

    // ...and pivoted back to wide (extract.py:183-187): round-trip
    // identity, explicit metric list (no value-discovery scan).
    "pivot_long_wide" -> ((s, dir) => {
      val long = Reshape.unpivotToLong(
        t(s, dir, "orders").select(col("o_orderkey"),
          col("o_totalprice").cast(DoubleType).as("m_totalprice"),
          col("o_custkey").cast(DoubleType).as("m_custkey")),
        Seq("o_orderkey"), Seq("m_totalprice", "m_custkey"))
      Reshape.pivotToWide(long, Seq("o_orderkey"), "metric", "value",
        Seq("m_totalprice", "m_custkey"))
    }),

    // ---- repetition / quality (Gopher-style) ------------------------------
    // Duplicate-token fraction + top-bigram fraction from the single-pass
    // NgramStats kernel — scan-side repetition scoring, no per-signal
    // corpus shuffle.
    "text_repetition" -> ((s, dir) => {
      val u = graft.functions.TextExpressions.ngramStats(col("toks"), 1)
      val b = graft.functions.TextExpressions.ngramStats(col("toks"), 2)
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), u.as("u"), b.as("b"))
        .select(col("doc_id"),
          when(col("u.total") > 0,
            round(lit(1.0) - col("u.n_distinct").cast(DoubleType) /
              col("u.total").cast(DoubleType), 6))
            .otherwise(lit(0.0)).as("repetition_ratio"),
          when(col("b.total") > 0,
            round(col("b.max_count").cast(DoubleType) /
              col("b.total").cast(DoubleType), 6))
            .otherwise(lit(0.0)).as("top_bigram_frac"))
    }),

    // ---- embedding quantization -------------------------------------------
    // Symmetric int8 quantization (4x smaller vectors for the ANN recall
    // tier; floats re-read only at exact rescore). floor(x*scale + 0.5)
    // is bit-replicable in DuckDB; the gate emits the code digest.
    "vec_quantize_int8" -> ((s, dir) => {
      val qz = graft.functions.VectorExpressions.int8Quantize(col("embedding"))
      t(s, dir, "embeddings")
        .select(col("vec_id"), qz.as("qz"))
        .select(col("vec_id"),
          round(col("qz.scale"), 6).as("scale_r6"),
          md5(concat_ws(",", transform(col("qz.q"), x => x.cast(StringType))))
            .as("q_md5"),
          size(filter(col("qz.q"), x => abs(x) === 127)).cast(LongType).as("n_sat"))
    }),

    // ---- interval (range-containment) join --------------------------------
    // Each event labeled with its containing session: equi-join on
    // (user_id, hour-bin) + exact containment filter — never the
    // |events| x |sessions| theta-join a naive BETWEEN plans into.
    "interval_join_sessions" -> ((s, dir) => {
      val sess = batchSessions(s, dir)
        .select(col("user_id"), col("session_seq"),
          col("session_start"), col("session_end"))
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"), col("ts"))
      graft.ops.RangeJoin.intervalJoin(ev, sess, Seq("user_id"), "ts",
          "session_start", "session_end", binWidth = 3600L * 1000000L)
        .select(col("event_id"), col("user_id"), col("ts"), col("session_seq"))
    }),

    // ---- per-key quota cap ------------------------------------------------
    // First-N-per-key cap (per-domain / per-user quota of corpus
    // curation): WindowGroupLimit keeps k rows per group in memory.
    "cap_per_key" -> ((s, dir) =>
      Windows.topKPerGroup(
        Tables.events(s, dir).select(col("user_id"), col("event_id"), col("ts")),
        Seq("user_id"), Seq(col("ts").asc, col("event_id").asc), 5)),

    // ---- bucketed co-located join -----------------------------------------
    // Both sides written bucketed by the join key (io/Sinks
    // .writeBucketedState), then joined through the catalog: the join
    // reads co-located buckets and skips both shuffles (asserted
    // exchange-free in LayoutSpec; this gate grades the results).
    "join_bucketed" -> ((s, dir) => {
      graft.io.Sinks.writeBucketedState(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast(Dec152).as("o_price")),
        "g_orders_bkt", buckets = 8, keys = Seq("o_custkey"))
      graft.io.Sinks.writeBucketedState(
        t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        "g_customer_bkt", buckets = 8, keys = Seq("c_custkey"))
      s.table("g_orders_bkt")
        .join(s.table("g_customer_bkt"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("order_cnt"),
          sum(col("o_price")).cast(DoubleType).as("revenue"))
    }),

    // Bloom-pruned shuffle join: the fact side is pre-filtered by a Bloom
    // digest of the dimension keys before the exact join, so the fact
    // exchange carries |matching ∪ fpp| rows instead of |fact|. Result is
    // IDENTICAL to the plain join (false positives die in the join), so
    // the oracle is simply the plain join.
    "join_bloom_pruned" -> ((s, dir) =>
      BloomPrune.bloomPrunedJoin(
          t(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
          "l_orderkey",
          t(s, dir, "orders").where(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_totalprice")),
          "o_orderkey", expectedItems = 200000L)
        .select(col("l_orderkey"),
          col("l_linenumber").cast(LongType).as("l_linenumber"),
          col("l_quantity").cast(DoubleType).as("quantity"),
          col("o_totalprice").cast(DoubleType).as("o_totalprice"))),

    // ---- incrementally-maintained rollup ----------------------------------
    // Three batch summaries folded into one state (ops/IncrementalAgg)
    // must equal the single-shot aggregate — the algebraic-merge
    // property that replaces O(history) re-aggregation with O(batch)
    // maintenance. The oracle IS the single-shot form.
    "incremental_rollup" -> ((s, dir) => {
      val orders = t(s, dir, "orders").select(col("o_orderstatus"),
        col("o_totalprice").cast(Dec152).as("price"), col("o_orderkey"))
      val batches = (0 until 3).map(i =>
        orders.where(pmod(col("o_orderkey"), lit(3)) === i))
      val init = graft.ops.IncrementalAgg.summarize(
        batches.head, Seq("o_orderstatus"), col("price"))
      val state = batches.tail.foldLeft(init)((st, b) =>
        graft.ops.IncrementalAgg.merge(st,
          graft.ops.IncrementalAgg.summarize(b, Seq("o_orderstatus"), col("price")),
          Seq("o_orderstatus")))
      state.select(col("o_orderstatus"), col("cnt"),
        col("sum_v").cast(DoubleType).as("sum_v"),
        col("min_v").cast(DoubleType).as("min_v"),
        col("max_v").cast(DoubleType).as("max_v"))
    }),

    // ---- incrementally-maintained quantile sketch -------------------------
    // Three batch sketches folded into one state (ops/QuantileSketch, the
    // HDR-histogram state) must equal the single-shot histogram — same
    // algebraic-merge contract as incremental_rollup, for quantiles.
    // p50/p90 read off the merged sketch are replicated exactly by the
    // oracle's single-shot histogram; the *_within_tol columns compare
    // them to Spark's exact percentile (bucket width 1/16 -> tolerance
    // 0.1) with a literal-TRUE oracle twin — the tripwire that fires if
    // a precision change silently degrades the sketch.
    "incremental_quantiles" -> ((s, dir) => {
      import graft.ops.QuantileSketch
      val orders = t(s, dir, "orders").select(col("o_orderstatus"),
        (col("o_totalprice").cast(Dec152) * 100).cast(LongType).as("cents"),
        col("o_orderkey"))
      val batches = (0 until 3).map(i =>
        orders.where(pmod(col("o_orderkey"), lit(3)) === i))
      val init = QuantileSketch.summarize(batches.head, Seq("o_orderstatus"), col("cents"))
      val state = batches.tail.foldLeft(init)((st, b) =>
        QuantileSketch.merge(st,
          QuantileSketch.summarize(b, Seq("o_orderstatus"), col("cents")),
          Seq("o_orderstatus")))
      val sketched = QuantileSketch.quantiles(state, Seq("o_orderstatus"),
        Seq(("p50_cents", 1, 2), ("p90_cents", 9, 10)))
      val exact = orders.groupBy(col("o_orderstatus")).agg(
        expr("percentile(cents, 0.5d)").as("e50"),
        expr("percentile(cents, 0.9d)").as("e90"))
      sketched.join(exact, Seq("o_orderstatus"))
        .select(col("o_orderstatus"), col("n"), col("p50_cents"), col("p90_cents"),
          (abs(col("p50_cents").cast(DoubleType) / col("e50") - 1) <= 0.1)
            .as("p50_within_tol"),
          (abs(col("p90_cents").cast(DoubleType) / col("e90") - 1) <= 0.1)
            .as("p90_within_tol"))
    }),

    // ---- filter-with-reasons audit ----------------------------------------
    // Per-document keep/drop with per-rule booleans (the corpus-curation
    // audit report: a pipeline that silently drops documents is
    // undebuggable at 100 TB). One scan — every rule is a scan-side
    // kernel; the report doubles as the filter (keep == all rules pass).
    "corpus_filter_report" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("text"),
          graft.functions.TextExpressions.ngramStats(col("toks"), 1).as("u0"))
        .select(col("doc_id"),
          (TextAnalysis.langId(col("text")) === "en").as("pass_lang"),
          (round(TextAnalysis.qualityScore(col("text")), 6) >= 0.45).as("pass_quality"),
          (when(col("u0.total") > 0,
            lit(1.0) - col("u0.n_distinct").cast(DoubleType) /
              col("u0.total").cast(DoubleType))
            .otherwise(lit(0.0)) < 0.6).as("pass_repetition"),
          (TextAnalysis.patternCount(col("text"),
            TextAnalysis.FilterPatterns.collectFirst { case ("long_digits", p) => p }.get) === 0)
            .as("pass_no_digit_runs"))
        .withColumn("keep",
          col("pass_lang") && col("pass_quality") &&
            col("pass_repetition") && col("pass_no_digit_runs"))),

    // ---- sequence packing -------------------------------------------------
    // Concat-and-chunk assignment (the pretraining packing pass): docs
    // hash-sharded, shard-local running token sums map each doc to its
    // (shard, chunk) span — nShards independent windows, never a global
    // one-partition running sum. Gate uses the md5 hash so DuckDB
    // replicates shards exactly.
    "pack_chunks" -> ((s, dir) =>
      graft.ops.Packing.chunkAssignments(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", TextAnalysis.tokenCount(col("text")),
        maxTokens = 512, nShards = 8, hashFn = Dedup.Md5Hash60)),

    // ---- live streaming dedup ---------------------------------------------
    // REAL dropDuplicatesWithinWatermark execution (state bounded by the
    // watermark): file stream -> dedup -> parquet sink, AvailableNow.
    // event_id is globally unique in the testdata, so the deduped output
    // set is deterministic regardless of arrival order.
    "streaming_dedup_live" -> ((s, dir) => {
      val ckpt = graft.util.Scratch.dir("graft_sdedup_ck")
      val out = graft.util.Scratch.dir("graft_sdedup_out") + "/t"
      withShufflePartitions(s, 8) {
        val q = graft.streaming.EventStreams
          .dedupStream(Tables.eventsStream(s, dir), watermark = "2 hours")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("ts"), col("value"))
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", out).start()
        q.awaitTermination()
      }
      s.read.parquet(out)
    }),

    // ---- live custom-state sessionization ----------------------------------
    // flatMapGroupsWithState executed for real. A session emits either
    // when a later event of its user arrives past the gap, or when the
    // trailing no-data batch fires its event-time timeout (set to last
    // event ms + gap; Spark fires on timeout STRICTLY below the
    // watermark — verified against FlatMapGroupsWithStateExec) — so only
    // final sessions ending within the gap of the stream's max timestamp
    // stay in state. The oracle expresses exactly that set. total_value
    // is a sequential fold in (ts, event_id) order on both engines
    // (DuckDB's ordered SUM is the same left fold — verified). The gate
    // relies on the file source delivering all files in ONE batch
    // (maxFilesPerTrigger unset — see EventStreams.sessionize's
    // single-wave ordering contract).
    "streaming_sessionize_live" -> ((s, dir) => {
      import s.implicits._
      val ckpt = graft.util.Scratch.dir("graft_ssess_ck")
      val out = graft.util.Scratch.dir("graft_ssess_out") + "/t"
      val evs = Tables.eventsStream(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[graft.streaming.EventStreams.Event]
      withShufflePartitions(s, 8) {
        val q = graft.streaming.EventStreams.sessionize(evs, gapMs = 30L * 60 * 1000)
          .toDF()
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", out).start()
        q.awaitTermination()
      }
      s.read.parquet(out)
    }),

    // ---- live incremental MERGE sink ---------------------------------------
    // foreachBatch MERGE into Parquet state, executed for real: the
    // winner per key is a total order over state AND batch, so the final
    // state equals a batch last-write-wins dedup over all events no
    // matter how the stream micro-batched (the convergence contract).
    "streaming_merge_live" -> ((s, dir) => {
      val ckpt = graft.util.Scratch.dir("graft_smerge_ck")
      val statePath = graft.util.Scratch.dir("graft_smerge_state") + "/state"
      withShufflePartitions(s, 8) {
        val q = graft.streaming.EventStreams.mergeSink(
          Tables.eventsStream(s, dir)
            .select(col("user_id"), col("event_type"), col("event_id"),
              col("ts"), col("value")),
          statePath, keys = Seq("user_id", "event_type"),
          precedence = Seq(col("ts").desc, col("event_id").desc),
          checkpoint = ckpt)
        q.awaitTermination()
      }
      s.read.parquet(statePath)
    }),

    // ---- multi-wave delivery twins ----------------------------------------
    // The same sessionize / merge pipelines driven through the waved
    // fixture (Tables.wavedEventsStream): three time-ordered micro-batches
    // via maxFilesPerTrigger=1, so sessions span batches, event-time
    // timeouts fire BETWEEN batches as the watermark advances wave to
    // wave, and the merge folds three partial states. The oracles are
    // IDENTICAL to the _live twins: re-batching must not change a single
    // answer — that is the cross-micro-batch state contract.
    "streaming_sessionize_waves" -> ((s, dir) => {
      import s.implicits._
      val ckpt = graft.util.Scratch.dir("graft_ssessw_ck")
      val out = graft.util.Scratch.dir("graft_ssessw_out") + "/t"
      val evs = Tables.wavedEventsStream(s, dir, nWaves = 3)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[graft.streaming.EventStreams.Event]
      withShufflePartitions(s, 8) {
        val q = graft.streaming.EventStreams.sessionize(evs, gapMs = 30L * 60 * 1000)
          .toDF()
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", out).start()
        q.awaitTermination()
      }
      s.read.parquet(out)
    }),

    "streaming_merge_waves" -> ((s, dir) => {
      val ckpt = graft.util.Scratch.dir("graft_smergew_ck")
      val statePath = graft.util.Scratch.dir("graft_smergew_state") + "/state"
      withShufflePartitions(s, 8) {
        val q = graft.streaming.EventStreams.mergeSink(
          Tables.wavedEventsStream(s, dir, nWaves = 3)
            .select(col("user_id"), col("event_type"), col("event_id"),
              col("ts"), col("value")),
          statePath, keys = Seq("user_id", "event_type"),
          precedence = Seq(col("ts").desc, col("event_id").desc),
          checkpoint = ckpt)
        q.awaitTermination()
      }
      s.read.parquet(statePath)
    }),

    // ---- late/out-of-order delivery twins ---------------------------------
    // The same pipelines driven through the LATE fixture
    // (Tables.lateWavedEventsStream): every event_id % 10 == 0 row is
    // delivered one wave after its event-time wave, so it arrives BEHIND
    // the watermark the in-order waves advanced. With a 96-hour allowed
    // lateness over ~7.5-day waves, roughly half the displaced rows are
    // within the watermark (they must FOLD into open state) and half are
    // beyond it (they must be DROPPED) — the two late-data behaviors the
    // time-ordered waves fixture can never exercise. The oracles replicate
    // the delivery schedule and per-wave watermark sequence exactly
    // (boundary rules pinned by EventStreamsSpec's late-semantics probes).
    "streaming_tumbling_late" -> ((s, dir) => {
      val ckpt = graft.util.Scratch.dir("graft_stlate_ck")
      val out = graft.util.Scratch.dir("graft_stlate_out") + "/agg"
      withShufflePartitions(s, 8) {
        val q = graft.streaming.EventStreams
          .tumblingAgg(Tables.lateWavedEventsStream(s, dir, nWaves = 4),
            watermark = "96 hours")
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", out).start()
        q.awaitTermination()
      }
      s.read.parquet(out)
        .select(col("hour_start"), col("event_type"), col("cnt"),
          col("sum_value").cast(DoubleType).as("sum_value"))
    }),

    "streaming_sessionize_late" -> ((s, dir) => {
      import s.implicits._
      val ckpt = graft.util.Scratch.dir("graft_sslate_ck")
      val out = graft.util.Scratch.dir("graft_sslate_out") + "/t"
      val evs = Tables.lateWavedEventsStream(s, dir, nWaves = 4)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[graft.streaming.EventStreams.Event]
      withShufflePartitions(s, 8) {
        val q = graft.streaming.EventStreams
          .sessionize(evs, gapMs = 30L * 60 * 1000, watermark = "96 hours")
          .toDF()
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", out).start()
        q.awaitTermination()
      }
      s.read.parquet(out)
    }),

    "streaming_merge_late" -> ((s, dir) => {
      val ckpt = graft.util.Scratch.dir("graft_smlate_ck")
      val statePath = graft.util.Scratch.dir("graft_smlate_state") + "/state"
      withShufflePartitions(s, 8) {
        val q = graft.streaming.EventStreams.mergeSink(
          Tables.lateWavedEventsStream(s, dir, nWaves = 4)
            .select(col("user_id"), col("event_type"), col("event_id"),
              col("ts"), col("value")),
          statePath, keys = Seq("user_id", "event_type"),
          precedence = Seq(col("ts").desc, col("event_id").desc),
          checkpoint = ckpt)
        q.awaitTermination()
      }
      s.read.parquet(statePath)
    }),

    // ---- live stream-stream interval join ---------------------------------
    // Clicks joined to same-user purchases within the prior hour, both
    // sides watermarked (bounded join state) — the streaming as-of window,
    // executed for real and graded against the batch theta-join oracle.
    "streaming_join_live" -> ((s, dir) => {
      val ckpt = graft.util.Scratch.dir("graft_sjoin_ck")
      val out = graft.util.Scratch.dir("graft_sjoin_out") + "/t"
      withShufflePartitions(s, 8) {
        val q = graft.streaming.EventStreams
          .clickPurchaseJoin(Tables.eventsStream(s, dir), watermark = "2 hours")
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", out).start()
        q.awaitTermination()
      }
      s.read.parquet(out)
    }),

    // Late/out-of-order twin of the stream-stream interval join: rows
    // displaced two waves arrive behind the in-order waves' watermark.
    // Each SIDE drops its sub-watermark late inputs (raw event time vs
    // the global watermark — the min over both sides' per-type maxima);
    // surviving late rows still match the other side's state, whose
    // eviction bounds (click_ts < wm; purchase_ts < wm - 1h) provably
    // never remove a row a surviving input could need (see the oracle's
    // derivation comment). EventStreamsSpec pins the drop-vs-match rule
    // per side on a controlled fixture.
    "streaming_join_late" -> ((s, dir) => {
      val ckpt = graft.util.Scratch.dir("graft_sjlate_ck")
      val out = graft.util.Scratch.dir("graft_sjlate_out") + "/t"
      withShufflePartitions(s, 8) {
        val q = graft.streaming.EventStreams
          .clickPurchaseJoin(Tables.lateWavedEventsStream(s, dir, nWaves = 4),
            watermark = "96 hours")
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", out).start()
        q.awaitTermination()
      }
      s.read.parquet(out)
    })
  )

  // ------------------------------------------------------------- oracle SQL

  /** DuckDB lambda for per-language stopword hits over a token list. */
  private def hitsSql(toksExpr: String, words: Seq[String]): String =
    s"len(list_filter($toksExpr, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  private val EnWords = TextAnalysis.StopwordLists.head._2

  /** doc_id -> smallest doc id reachable through the trigram-Jaccard pair
    * graph — the labeling shared by the cluster gate, the leakage-safe
    * split, and canonical-by-quality selection.
    *
    * The iterative CC loop runs over REPRESENTATIVES (exact-collapse):
    * duplicate groups ride one node through every round and expand at the
    * end. Identical labels to CC over the expanded pair graph — every
    * group minimum IS its rep, so a component's min doc id is the min rep
    * id; members of groups whose every shingle was hot-capped away have
    * no pair edges and label themselves, exactly as they would in the
    * expanded graph.
    */
  private def docClusterReps(s: SparkSession, dir: String): DataFrame =
    clusterLabelsOf(t(s, dir, "documents"))

  /** The near-dup cluster-label table as a persisted input fixture, for
    * gates whose OPERATOR merely consumes labels (canonical-by-quality
    * selection, leakage-safe splitting): in a deployment those run over
    * the label table dedup already maintains. Goes through StateSeed so
    * bench reps time the consuming operator, not label construction;
    * Verify still builds fresh per call. `dedup_cluster_reps` itself
    * never uses this — constructing the labels IS that gate's operator.
    */
  private def docClusterLabelTable(s: SparkSession, dir: String): DataFrame = {
    val root = graft.util.StateSeed.root("graft_doclabels", dir) { root =>
      docClusterReps(s, dir).write.parquet(root + "/labels")
    }
    s.read.parquet(root + "/labels")
  }

  private def clusterLabelsOf(docs: DataFrame): DataFrame = {
    val c = Dedup.exactCollapse(docs, "doc_id", "text", cache = df => df.persist())
    val idx = Dedup.countedShingleIndexCollapsed(c, n = 3, maxDocFreq = 100L).persist()
    val repLabels = Dedup.clusterRepresentatives(
      c.reps.select(col("doc_id")), "doc_id",
      Dedup.ngramJaccardPairsFromIndex(idx, threshold = 0.5),
      cache = df => df.persist())
    c.membership
      .join(repLabels.select(col("doc_id").as("rep_id"), col("rep").as("_rl")), Seq("rep_id"))
      .join(idx.select(col("doc_id").as("rep_id")).distinct()
        .withColumn("_survived", lit(true)), Seq("rep_id"), "left")
      .select(col("doc_id"),
        when(col("_survived") || col("doc_id") === col("rep_id"), col("_rl"))
          .otherwise(col("doc_id")).as("rep"))
  }

  /** Shared DuckDB replica of the trigram-Jaccard pair generation
    * (shingle index, hot cap 100, threshold 0.5) ending in CTE
    * `jpairs(doc_a, doc_b, jaccard)` — used by the pair gate and as the
    * edge set of the cluster-representative fixpoint. */
  private def jaccardPairsCte(where: String = ""): String =
    s"""t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents$where),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
      |         i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
      |       FROM t),
      |hot AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) > 100),
      |idx AS (SELECT doc_id, shingle FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
      |sizes AS (SELECT doc_id, count(*) AS nsh FROM idx GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      |  FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |jpairs AS (
      |  SELECT doc_a, doc_b,
      |    CAST(i AS DOUBLE) / (sa.nsh + sb.nsh - i) AS jaccard
      |  FROM inter
      |  JOIN sizes sa ON doc_a = sa.doc_id
      |  JOIN sizes sb ON doc_b = sb.doc_id
      |  WHERE CAST(i AS DOUBLE) / (sa.nsh + sb.nsh - i) >= 0.5)""".stripMargin

  /** DuckDB twin of [[Dedup.Md5Hash60]] (60-bit md5-derived term hash). */
  private def md5Hash60Sql(e: String): String =
    s"CAST('0x' || substr(md5($e),1,15) AS BIGINT)"

  /** Reachability fixpoint over the Jaccard pair graph ending in CTE
    * `lbl(doc_id, rep)` — min reachable id per node == the
    * propagation-converged representative. Callers prefix `WITH
    * RECURSIVE`. Shared by the cluster gate, the leakage-safe split, and
    * canonical selection. */
  private val clusterRepsCte: String =
    s"""${jaccardPairsCte()},
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM jpairs
       |          UNION ALL SELECT doc_b, doc_a FROM jpairs),
       |reach(node, root) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node),
       |lbl AS (SELECT node AS doc_id, MIN(root) AS rep FROM reach GROUP BY 1)""".stripMargin


  /** Full-recompute reachability fixpoint over the incremental pair
    * semantics (history-internal pairs under the history hot cap, plus
    * the batch self/cross pairs of the dedup_incremental replica) —
    * shared by the batch fold gate and its live streaming twin; a hash
    * match proves the contracted-graph fold equals recomputing CC over
    * history ∪ batch.
    */
  private val incrementalPairsOracleSql: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
      |         i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
      |       FROM t),
      |ssh AS (SELECT * FROM sh WHERE doc_id % 2 = 0),
      |bsh AS (SELECT * FROM sh WHERE doc_id % 2 <> 0),
      |sidx AS (SELECT doc_id, shingle FROM ssh WHERE shingle NOT IN (
      |           SELECT shingle FROM ssh GROUP BY 1 HAVING count(*) > 100)),
      |bidx AS (SELECT doc_id, shingle FROM bsh WHERE shingle NOT IN (
      |           SELECT shingle FROM bsh GROUP BY 1 HAVING count(*) > 100)),
      |ssz AS (SELECT doc_id, count(*) AS nsh FROM sidx GROUP BY 1),
      |bsz AS (SELECT doc_id, count(*) AS nsh FROM bidx GROUP BY 1),
      |selfp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      |          FROM bidx a JOIN bidx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |crossp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      |           FROM sidx a JOIN bidx b ON a.shingle = b.shingle
      |           GROUP BY 1, 2)
      |SELECT doc_a, doc_b, round(CAST(i AS DOUBLE) / (sa.nsh + sb.nsh - i), 6) AS jaccard,
      |       'batch' AS src
      |FROM selfp JOIN bsz sa ON doc_a = sa.doc_id JOIN bsz sb ON doc_b = sb.doc_id
      |WHERE CAST(i AS DOUBLE) / (sa.nsh + sb.nsh - i) >= 0.5
      |UNION ALL
      |SELECT doc_a, doc_b, round(CAST(i AS DOUBLE) / (sa.nsh + sb.nsh - i), 6) AS jaccard,
      |       'state' AS src
      |FROM crossp JOIN ssz sa ON doc_a = sa.doc_id JOIN bsz sb ON doc_b = sb.doc_id
      |WHERE CAST(i AS DOUBLE) / (sa.nsh + sb.nsh - i) >= 0.5""".stripMargin

  private val incrementalClusterRepsOracleSql: String =
    """WITH RECURSIVE t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |         i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
        |       FROM t),
        |ssh AS (SELECT * FROM sh WHERE doc_id % 2 = 0),
        |bsh AS (SELECT * FROM sh WHERE doc_id % 2 <> 0),
        |sidx AS (SELECT doc_id, shingle FROM ssh WHERE shingle NOT IN (
        |           SELECT shingle FROM ssh GROUP BY 1 HAVING count(*) > 100)),
        |bidx AS (SELECT doc_id, shingle FROM bsh WHERE shingle NOT IN (
        |           SELECT shingle FROM bsh GROUP BY 1 HAVING count(*) > 100)),
        |ssz AS (SELECT doc_id, count(*) AS nsh FROM sidx GROUP BY 1),
        |bsz AS (SELECT doc_id, count(*) AS nsh FROM bidx GROUP BY 1),
        |histp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |          FROM sidx a JOIN sidx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |selfp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |          FROM bidx a JOIN bidx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |crossp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |           FROM sidx a JOIN bidx b ON a.shingle = b.shingle
        |           GROUP BY 1, 2),
        |allp AS (
        |  SELECT doc_a, doc_b FROM histp
        |  JOIN ssz sa ON doc_a = sa.doc_id JOIN ssz sb ON doc_b = sb.doc_id
        |  WHERE CAST(i AS DOUBLE) / (sa.nsh + sb.nsh - i) >= 0.5
        |  UNION ALL
        |  SELECT doc_a, doc_b FROM selfp
        |  JOIN bsz sa ON doc_a = sa.doc_id JOIN bsz sb ON doc_b = sb.doc_id
        |  WHERE CAST(i AS DOUBLE) / (sa.nsh + sb.nsh - i) >= 0.5
        |  UNION ALL
        |  SELECT doc_a, doc_b FROM crossp
        |  JOIN ssz sa ON doc_a = sa.doc_id JOIN bsz sb ON doc_b = sb.doc_id
        |  WHERE CAST(i AS DOUBLE) / (sa.nsh + sb.nsh - i) >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM allp
        |          UNION ALL SELECT doc_b, doc_a FROM allp),
        |reach(node, root) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node)
        |SELECT node AS doc_id, MIN(root) AS rep FROM reach GROUP BY 1""".stripMargin

  /** Replica of the rounded text_quality score ending in CTE
    * `q(doc_id, quality)` — shared by the text_quality gate and canonical
    * selection. CTE names qb/q chosen to never collide with the pair-graph
    * CTEs above. */
  private val qualityCte: String = {
    val toks = "regexp_split_to_array(trim(text), '\\s+')"
    s"""qb AS (
       |  SELECT doc_id,
       |    CAST(length(text) AS DOUBLE) AS n_char,
       |    CAST(len($toks) AS DOUBLE) AS n_tok,
       |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
       |    CAST(${hitsSql(toks, EnWords)} AS DOUBLE) AS en_hits
       |  FROM documents),
       |q AS (SELECT doc_id, round(
       |    (CASE WHEN n_char > 0 THEN n_alpha / n_char ELSE 0.0 END) * 0.4
       |  + (CASE WHEN n_tok > 0 THEN en_hits / n_tok ELSE 0.0 END) * 0.3
       |  + least(n_tok / 100.0, 1.0) * 0.3, 6) AS quality
       |FROM qb)""".stripMargin
  }

  /** Shared by the sample_mixture gate and its oracle so the weights can
    * never drift apart. */
  private val MixtureTargets = Seq("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)

  /** Replica of [[graft.ops.Sampling.mixtureSample]]: group counts, the
    * binding-group mixture size min(n/w), per-group floor thresholds over
    * the md5 bucket — the double arithmetic ORDER matches the Scala side
    * literally (((w * nt) / n) * 10000).
    */
  private def mixtureOracleSql: String = {
    val inList = MixtureTargets.map(t => s"'${t._1}'").mkString(", ")
    val wCase = MixtureTargets
      .map { case (g, w) => s"WHEN '$g' THEN CAST($w AS DOUBLE)" }.mkString(" ")
    s"""WITH c AS (SELECT source, count(*) AS n FROM documents
       |           WHERE source IN ($inList) GROUP BY 1),
       |r AS (SELECT source, n, CASE source $wCase END AS w FROM c),
       |nt AS (SELECT min(n / w) AS v FROM r),
       |thr AS (SELECT source,
       |          CASE WHEN n / w = (SELECT v FROM nt) THEN 10000
       |               ELSE floor(w * (SELECT v FROM nt) / n * 10000) END AS t
       |        FROM r)
       |SELECT d.doc_id, d.source
       |FROM documents d JOIN thr ON d.source = thr.source
       |WHERE ${md5Hash60Sql("CAST(d.doc_id AS VARCHAR)")} % 10000 < thr.t""".stripMargin
  }

  /** DuckDB twin of [[Normalize.safeDecimal]]: strip `[,$%\s]`, sentinel
    * strings to null, try-cast WIDE (scale+6 — the Spark side parses wide
    * and quantizes only AFTER the millions heuristic, so sub-cent values
    * scale rather than truncate), heuristic, quantize to (15,2). */
  private def safeDecimalSql(e: String): String = {
    val cl = s"regexp_replace($e, '[,$$%\\s]', '', 'g')"
    val cl2 = s"(CASE WHEN $cl IN ('', 'N/A', 'n/a', '-') THEN NULL ELSE $cl END)"
    val v = s"TRY_CAST($cl2 AS DECIMAL(21,8))"
    s"TRY_CAST((CASE WHEN $v > 0 AND $v < 1000000 THEN $v * 1000000 ELSE $v END) AS DECIMAL(15,2))"
  }

  /** DuckDB twin of [[Normalize.millionsValidator]] (scales ANY value
    * below 1e6, including negatives). */
  private def millionsSql(e: String): String =
    s"TRY_CAST((CASE WHEN $e IS NOT NULL AND $e < 1000000 THEN $e * 1000000 ELSE $e END) AS DECIMAL(15,2))"

  /** DuckDB replica of the full income-normalization flow over the
    * [[incomeBronzeFixture]] rows (same m-branch layout). Shared by the
    * normalize-only gate and the end-to-end run gate; the latter appends
    * the quarantine filter + last-write-wins merge.
    */
  private def incomeNormalizeCte(badDates: Boolean): String = {
    val m1Date = if (badDates) "'not-a-date'" else "''"
    val m1Year = if (badDates) "'bad'" else "CAST(year(o_orderdate) AS VARCHAR)"
    s"""WITH src AS (
       |  SELECT o_orderkey, o_orderdate, o_orderkey % 4 AS m,
       |    'TK' || CAST(o_orderkey % 5 AS VARCHAR) AS symbol,
       |    CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR) AS num_s,
       |    CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) AS ni_s
       |  FROM orders WHERE o_orderkey < 2000),
       |b AS (
       |  SELECT *,
       |    CASE WHEN m = 1 THEN $m1Date
       |         WHEN m = 3 THEN strftime(o_orderdate, '%m/%d/%Y')
       |         ELSE strftime(o_orderdate, '%Y-%m-%d') END AS date_s,
       |    CASE WHEN m = 1 THEN $m1Year ELSE CAST(year(o_orderdate) AS VARCHAR) END AS cal_year,
       |    CASE WHEN m = 2 THEN 'N/A' ELSE num_s END AS revenue_s,
       |    CASE WHEN m = 3 THEN '' ELSE num_s END AS eps_s,
       |    '$$' || num_s AS gross_s
       |  FROM src),
       |k AS (SELECT *, CASE WHEN date_s IS NULL OR date_s = ''
       |        OR COALESCE(TRY_CAST(date_s AS DOUBLE) = 0, FALSE)
       |        THEN cal_year ELSE date_s END AS datekey FROM b),
       |p AS (SELECT *, COALESCE(
       |        CAST(try_strptime(datekey, '%Y-%m-%d') AS DATE),
       |        CAST(try_strptime(datekey, '%Y-%m-%d %H:%M:%S') AS DATE),
       |        CAST(try_strptime(datekey, '%m/%d/%Y') AS DATE),
       |        CASE WHEN regexp_full_match(datekey, '\\d{4}(\\.0+)?')
       |             THEN make_date(CAST(CAST(datekey AS DOUBLE) AS INT), 12, 31) END) AS quarter_date
       |      FROM k),
       |c1 AS (SELECT *, ${safeDecimalSql("revenue_s")} AS rev_sd,
       |         ${safeDecimalSql("gross_s")} AS gp_sd,
       |         ${safeDecimalSql("ni_s")} AS ni_sd FROM p),
       |c2 AS (SELECT *,
       |    CAST(year(quarter_date) AS VARCHAR) || '-Q' || CAST(quarter(quarter_date) AS VARCHAR) AS quarter_label,
       |    ${millionsSql("rev_sd")} AS revenue_dec,
       |    ${millionsSql("gp_sd")} AS gp_dec,
       |    TRY_CAST(eps_s AS DECIMAL(10,4)) AS eps_a,
       |    CAST(ni_sd AS DOUBLE) AS ni_d
       |  FROM c1),
       |c3 AS (SELECT *,
       |    CASE WHEN eps_a IS NULL OR COALESCE(TRY_CAST(CAST(eps_a AS VARCHAR) AS DOUBLE) = 0, FALSE)
       |         THEN NULL ELSE eps_a END AS eps_direct,
       |    CAST(round((CASE WHEN ni_d >= 1000000 THEN ni_d / 1000000 ELSE ni_d END) / 1000.0, 4)
       |      AS DECIMAL(10,4)) AS eps_est
       |  FROM c2)""".stripMargin
  }

  /** DuckDB replica of the FULL MinHash+LSH pipeline — signatures with the
    * exact permutation constants from [[Dedup.MinHashParams]], banding,
    * candidate equi-join, and exact Jaccard verification of candidates.
    */
  private def minHashLshOracleSql(where: String = ""): String = {
    val p = Dedup.MinHashParams()
    val mh = (0 until p.numPerm).map(i =>
      s"min((hm * ${p.as(i)} + ${p.bs(i)}) % ${p.prime}) AS mh_$i").mkString(", ")
    val bandSelects = (0 until p.bands).map { b =>
      val key = (0 until p.rowsPerBand)
        .map(r => s"CAST(mh_${b * p.rowsPerBand + r} AS VARCHAR)")
        .mkString(" || ':' || ")
      s"SELECT doc_id, $b AS band, $key AS bkey FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents$where),
       |shs AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
       |          i -> array_to_string(toks[i:i+2], ' ')))) AS shingle_s FROM t),
       |sh AS (SELECT doc_id, ${md5Hash60Sql("shingle_s")} AS shingle FROM shs),
       |hot AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) > 100),
       |idx AS (SELECT doc_id, shingle FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
       |hmt AS (SELECT doc_id, shingle % ${p.prime} AS hm FROM idx),
       |sig AS (SELECT doc_id, $mh FROM hmt GROUP BY 1),
       |bk AS ($bandSelects),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM bk x JOIN bk y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS nsh FROM idx GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ic
       |          FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
       |          GROUP BY 1, 2)
       |SELECT t2.doc_a, t2.doc_b, CAST(t2.ic AS DOUBLE) / (sa.nsh + sb.nsh - t2.ic) AS jaccard
       |FROM inter t2 JOIN sizes sa ON t2.doc_a = sa.doc_id JOIN sizes sb ON t2.doc_b = sb.doc_id
       |WHERE CAST(t2.ic AS DOUBLE) / (sa.nsh + sb.nsh - t2.ic) >= 0.5""".stripMargin
  }

  /** DuckDB replica of the 60-bit SimHash pipeline: per-bit sign votes
    * over md5-hashed distinct tokens, 4x15-bit band candidates, exact
    * Hamming verification via xor + bit_count.
    */
  private def simHashOracleSql: String = {
    val votes = (0 until 60).map(b =>
      s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v_$b").mkString(", ")
    val bits = (0 until 60).map(b =>
      s"(CASE WHEN v_$b > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END)").mkString(" | ")
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id, simhash, $b AS band, (simhash >> ${b * 15}) & 32767 AS bkey FROM sig")
      .mkString(" UNION ALL ")
    s"""WITH t AS (SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |h AS (SELECT doc_id, ${md5Hash60Sql("tok")} AS h FROM tok),
       |v AS (SELECT doc_id, $votes FROM h GROUP BY 1),
       |sig AS (SELECT doc_id, $bits AS simhash FROM v),
       |bk AS ($bands)
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
       |FROM bk x JOIN bk y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3""".stripMargin
  }

  /** DuckDB replica of IVF top-k: decimal-sum/count centroids (exactly the
    * [[Similarity.centroids]] math), nprobe centroid ranking, probed-cell
    * scan, per-query top-k.
    */
  private def ivfOracleSql: String =
    s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |           FROM embeddings),
       |ex AS (SELECT vec_id, label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM e),
       |cm AS (SELECT label AS centroid_id, pos,
       |         CAST(SUM(CAST(val AS DECIMAL(27,12))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS m
       |       FROM ex GROUP BY 1, 2),
       |cent AS (SELECT centroid_id, list(m ORDER BY pos) AS cv FROM cm GROUP BY 1),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
       |pr AS (SELECT query_id, qv, centroid_id,
       |         list_dot_product(qv, cv) AS d,
       |         sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) AS nn
       |       FROM q CROSS JOIN cent),
       |pr2 AS (SELECT query_id, qv, centroid_id,
       |          row_number() OVER (PARTITION BY query_id
       |            ORDER BY (CASE WHEN nn > 0 THEN d / nn END) DESC, centroid_id) AS crank
       |        FROM pr),
       |probes AS (SELECT query_id, qv, centroid_id FROM pr2 WHERE crank <= 3),
       |c AS (SELECT vec_id AS neighbor_id, label AS centroid_id, v AS nv FROM e),
       |sc AS (SELECT p.query_id, c.neighbor_id,
       |         list_dot_product(p.qv, c.nv) AS d,
       |         sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(c.nv, c.nv)) AS nn
       |       FROM c JOIN probes p ON c.centroid_id = p.centroid_id
       |       WHERE p.query_id <> c.neighbor_id),
       |r AS (SELECT query_id, neighbor_id, CASE WHEN nn > 0 THEN d / nn END AS sim,
       |        row_number() OVER (PARTITION BY query_id
       |          ORDER BY (CASE WHEN nn > 0 THEN d / nn END) DESC, neighbor_id) AS rank
       |      FROM sc)
       |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim FROM r WHERE rank <= 5""".stripMargin

  /** Hash-table seeds for the multi-table LSH near-dup gate (shared by the
    * Spark side, its oracle, and the recall audit). */
  private val lshSeeds = Seq(42L, 43L, 44L)

  /** DuckDB replica of the multi-table random-hyperplane LSH near-dup
    * path: per-seed bucket ids from the exact plane coefficients of
    * [[Similarity.hyperplaneCoef]] embedded as literals, candidates =
    * bucket match in ANY table (distinct pair ids), exact cosine
    * verification once per surviving pair.
    */
  private def embeddingLshOracleSql(where: String = ""): String = {
    val bucketExprs = lshSeeds.zipWithIndex.map { case (seed, i) =>
      val planes = (0 until 4).map { b =>
        val arr = (0 until 64)
          .map(p => java.lang.Double.toString(Similarity.hyperplaneCoef(seed, b, p)))
          .mkString(", ")
        s"(CASE WHEN list_dot_product(v, [$arr]) > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END)"
      }.mkString(" | ")
      s"$planes AS b$i"
    }
    val anyTable = lshSeeds.indices.map(i => s"a.b$i = b.b$i").mkString(" OR ")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings$where),
       |bkt AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, ${bucketExprs.mkString(", ")} FROM e),
       |cand AS (SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
       |         FROM bkt a JOIN bkt b ON a.vec_id < b.vec_id AND ($anyTable)),
       |p AS (SELECT c.doc_a, c.doc_b,
       |        list_dot_product(x.v, y.v) / (x.nrm * y.nrm) AS sim
       |      FROM cand c JOIN bkt x ON x.vec_id = c.doc_a
       |                  JOIN bkt y ON y.vec_id = c.doc_b)
       |SELECT doc_a, doc_b, round(sim, 6) AS sim FROM p WHERE sim >= 0.45""".stripMargin
  }

  /** Incremental replica of the vector twin: even ids are the persisted
    * state buckets, odd ids the batch; batch-self pairs plus state x
    * batch bucket-collision pairs, cosine-verified.
    */
  private def incrementalEmbeddingLshOracleSql: String = {
    val bucketExprs = lshSeeds.zipWithIndex.map { case (seed, i) =>
      val planes = (0 until 4).map { b =>
        val arr = (0 until 64)
          .map(p => java.lang.Double.toString(Similarity.hyperplaneCoef(seed, b, p)))
          .mkString(", ")
        s"(CASE WHEN list_dot_product(v, [$arr]) > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END)"
      }.mkString(" | ")
      s"$planes AS b$i"
    }
    val anyTable = lshSeeds.indices.map(i => s"a.b$i = b.b$i").mkString(" OR ")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |bkt AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, ${bucketExprs.mkString(", ")} FROM e),
       |sb AS (SELECT * FROM bkt WHERE vec_id % 2 = 0),
       |bb AS (SELECT * FROM bkt WHERE vec_id % 2 <> 0),
       |selfp AS (SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
       |          FROM bb a JOIN bb b ON a.vec_id < b.vec_id AND ($anyTable)),
       |crossp AS (SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
       |           FROM sb a JOIN bb b ON ($anyTable)),
       |scored AS (
       |  SELECT c.doc_a, c.doc_b, c.src,
       |    list_dot_product(x.v, y.v) / (x.nrm * y.nrm) AS sim
       |  FROM (SELECT doc_a, doc_b, 'batch' AS src FROM selfp
       |        UNION ALL SELECT doc_a, doc_b, 'state' FROM crossp) c
       |  JOIN bkt x ON x.vec_id = c.doc_a
       |  JOIN bkt y ON y.vec_id = c.doc_b)
       |SELECT doc_a, doc_b, round(sim, 6) AS sim, src FROM scored WHERE sim >= 0.45""".stripMargin
  }

  /** DuckDB twin of the exact brute-force cosine top-k (shared by both
    * brute gates and, as the exact reference, by the recall audits).
    */
  private val bruteTopKOracleSql: String =
    """WITH q AS (SELECT vec_id AS query_id,
      |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      |           FROM embeddings WHERE vec_id < 8),
      |c AS (SELECT vec_id AS neighbor_id,
      |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      |      FROM embeddings),
      |s AS (SELECT query_id, neighbor_id,
      |        list_dot_product(qv, cv) AS d,
      |        sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) AS n
      |      FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
      |r AS (SELECT query_id, neighbor_id,
      |        CASE WHEN n > 0 THEN d / n END AS sim,
      |        row_number() OVER (PARTITION BY query_id
      |          ORDER BY CASE WHEN n > 0 THEN d / n END DESC, neighbor_id) AS rank
      |      FROM s)
      |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim FROM r WHERE rank <= 5""".stripMargin

  /** Recall-audit oracle: approximate top-k vs exact top-k, nested-WITH
    * composition of the two full replicas; meets_floor is the literal-TRUE
    * tripwire (see the recall_* gate comments).
    */
  private def topKRecallOracleSql(approxSql: String): String =
    s"""WITH approx AS ($approxSql),
       |exact AS ($bruteTopKOracleSql),
       |hits AS (SELECT a.query_id, count(*) AS hits
       |         FROM approx a JOIN exact e
       |           ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
       |         GROUP BY 1),
       |per AS (SELECT q.query_id, COALESCE(h.hits, 0) AS hits
       |        FROM (SELECT DISTINCT query_id FROM exact) q
       |        LEFT JOIN hits h ON q.query_id = h.query_id)
       |SELECT count(*) AS n_queries,
       |  round(CAST(SUM(hits) AS DOUBLE) / (count(*) * 5), 6) AS mean_recall,
       |  round(CAST(MIN(hits) AS DOUBLE) / 5, 6) AS min_recall,
       |  TRUE AS meets_floor
       |FROM per""".stripMargin

  /** DuckDB twin of the two-tier quantized search (shared by its gate and
    * its recall audit): quantization per vec_quantize_int8, int-code dot
    * exact in double, rescore over the float cosine.
    */
  private val quantizedRescoreOracleSql: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e),
      |z AS (SELECT vec_id, v,
      |        CASE WHEN maxabs > 0 THEN 127.0 / maxabs ELSE 0.0 END AS scale,
      |        list_transform(v, x ->
      |          floor(x * (CASE WHEN maxabs > 0 THEN 127.0 / maxabs ELSE 0.0 END) + 0.5)) AS qv
      |      FROM m),
      |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |        q.v AS qf, c.v AS cf,
      |        CASE WHEN q.scale > 0 AND c.scale > 0
      |          THEN list_dot_product(q.qv, c.qv) / (q.scale * c.scale)
      |          ELSE 0.0 END AS approx
      |      FROM z q CROSS JOIN z c
      |      WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
      |a AS (SELECT *, row_number() OVER (PARTITION BY query_id
      |        ORDER BY approx DESC, neighbor_id) AS arank FROM p),
      |r AS (SELECT query_id, neighbor_id,
      |        list_dot_product(qf, cf) AS d,
      |        sqrt(list_dot_product(qf, qf)) * sqrt(list_dot_product(cf, cf)) AS n
      |      FROM a WHERE arank <= 20),
      |s AS (SELECT query_id, neighbor_id,
      |        CASE WHEN n > 0 THEN d / n END AS sim,
      |        row_number() OVER (PARTITION BY query_id
      |          ORDER BY CASE WHEN n > 0 THEN d / n END DESC, neighbor_id) AS rank
      |      FROM r)
      |SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim FROM s WHERE rank <= 5""".stripMargin

  /** DuckDB twin of the exact embedding near-dup pair set (shared by its
    * gate and the LSH recall audit). */
  private def embeddingExactPairsOracleSql(where: String = ""): String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings$where),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      |p AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
      |        list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
      |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
      |SELECT doc_a, doc_b, round(sim, 6) AS sim FROM p WHERE sim >= 0.45""".stripMargin

  /** Recall-audit oracle for verified pair sets (doc_a < doc_b). */
  private def pairRecallOracleSql(approxSql: String, exactSql: String): String =
    s"""WITH approx AS ($approxSql),
       |exact AS ($exactSql),
       |h AS (SELECT count(*) AS n_hits FROM approx a JOIN exact e
       |        ON a.doc_a = e.doc_a AND a.doc_b = e.doc_b),
       |na AS (SELECT count(*) AS n_approx FROM approx),
       |ne AS (SELECT count(*) AS n_exact FROM exact)
       |SELECT ne.n_exact, na.n_approx,
       |  round(CAST(h.n_hits AS DOUBLE) / ne.n_exact, 6) AS recall,
       |  TRUE AS meets_floor
       |FROM ne, na, h""".stripMargin

  /** DuckDB replica of the emitted-session set (shared by the single-wave
    * live gate and the multi-wave twin): sessions closed by a later event
    * plus final sessions whose event-time timeout (last event ms + gap)
    * fell STRICTLY before the final watermark (max event ms) — Spark's
    * timeout predicate is `timeoutTimestamp < watermark`. total_value is
    * DuckDB's ordered SUM, the same left fold the stream computes.
    */
  private val sessionizeEmittedOracleSql: String =
      """WITH f AS (
        |  SELECT user_id, ts, event_id, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |g AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_ms(ts) - epoch_ms(prev_ts) >= 1800000 THEN 1 ELSE 0 END AS new_session
        |  FROM f),
        |h AS (
        |  SELECT user_id, ts, event_id, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM g),
        |sess AS (
        |  SELECT user_id, session_seq,
        |    MIN(ts) AS session_start, MAX(ts) AS session_end,
        |    count(*) AS n_events, SUM(value ORDER BY ts, event_id) AS total_value
        |  FROM h GROUP BY 1, 2),
        |last AS (SELECT user_id, MAX(session_seq) AS mx FROM sess GROUP BY 1),
        |wm AS (SELECT epoch_us(MAX(ts)) // 1000 AS wm_ms FROM events)
        |SELECT s.user_id, CAST(s.session_start AS TIMESTAMP) AS session_start,
        |  CAST(s.session_end AS TIMESTAMP) AS session_end,
        |  s.n_events, s.total_value
        |FROM sess s JOIN last l ON s.user_id = l.user_id, wm
        |WHERE s.session_seq < l.mx
        |   OR epoch_us(s.session_end) // 1000 + 1800000 < wm.wm_ms""".stripMargin

  /** Shared CTE prefix for the late-delivery oracles: replicates
    * [[graft.io.Tables.lateWavedEventsStream]]'s delivery schedule
    * (equal-width nanos waves over 4 waves, `event_id % 10 == 0` rows
    * displaced TWO waves later, capped at the last) and Spark's
    * per-batch watermark sequence — the watermark in force DURING wave v
    * is the max event time through wave v-2 (one batch of lag beyond the
    * obvious: a batch's stats are folded into the tracker only after it
    * commits, which is after the NEXT batch's metadata snapshot — see
    * lateWavedEventsStream's scaladoc), floored to milliseconds (Spark
    * tracks event time in ms), minus the 96-hour allowed lateness,
    * re-scaled to micros. Produces `s`: one row per delivered event with
    * its delivered wave `wv` and the watermark `wm_us` in force when it
    * arrived (NULL during the first two waves), plus `fw`: the final
    * watermark — AvailableNow appends no-data batches until the
    * watermark converges to max event time minus the delay, so emission
    * sees the fully-advanced value.
    */
  private val lateWaveCtes: String =
    """e AS (SELECT event_id, user_id, event_type, value,
      |        CAST(ts AS TIMESTAMP) AS tsv, epoch_ns(ts) AS tns,
      |        epoch_us(CAST(ts AS TIMESTAMP)) AS tus
      |      FROM events),
      |b AS (SELECT min(tns) AS tmin, max(tns) - min(tns) + 1 AS span FROM e),
      |d AS (SELECT e.*,
      |        CASE WHEN event_id % 10 = 0
      |             THEN least(CAST(((tns - b.tmin) * 4) // b.span AS INT) + 2, 3)
      |             ELSE CAST(((tns - b.tmin) * 4) // b.span AS INT) END AS wv
      |      FROM e, b),
      |m AS (SELECT wv, max(tus) AS mx FROM d GROUP BY wv),
      |w AS (SELECT wv,
      |        (max(mx) OVER (ORDER BY wv
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
      |         // 1000 - 345600000) * 1000 AS wm_us
      |      FROM m),
      |s AS (SELECT d.*, w.wm_us FROM d JOIN w ON d.wv = w.wv),
      |fw AS (SELECT (max(tus) // 1000 - 345600000) * 1000 AS f FROM e)""".stripMargin

  /** Late-delivery tumbling oracle. Drop/emit rules pinned by the
    * EventStreamsSpec probe: a delivered row is dropped iff its WINDOW
    * END is at or below the watermark in force (the streaming aggregate
    * keys late-filtering on the window's event-time column, so an
    * in-watermark late row folds into its still-open window even when
    * its raw ts is behind the watermark); a window is emitted in Append
    * mode iff its end is at or below the final watermark.
    */
  private val tumblingLateOracleSql: String =
    s"""WITH $lateWaveCtes,
       |surv AS (SELECT * FROM s WHERE wm_us IS NULL
       |           OR epoch_us(date_trunc('hour', tsv) + INTERVAL 1 HOUR) > wm_us),
       |agg AS (SELECT date_trunc('hour', tsv) AS hour_start, event_type,
       |          count(*) AS cnt,
       |          CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
       |        FROM surv GROUP BY 1, 2)
       |SELECT CAST(hour_start AS TIMESTAMP) AS hour_start, event_type, cnt, sum_value
       |FROM agg, fw WHERE epoch_us(hour_start + INTERVAL 1 HOUR) <= fw.f""".stripMargin

  /** Late-delivery sessionize oracle. The fMGWS late filter drops rows
    * with raw ts behind the watermark BEFORE the state function; the
    * survivors fold in PROCESSING order (wave, ts, event_id) — an
    * out-of-order survivor moves the session's `last` backward, so the
    * gap test compares consecutive events in processing order, and
    * session_start/session_end are the first/last events in processing
    * order, not min/max (EventStreamsSpec pins both rules). Emission is
    * the same rule as the in-order oracle: sessions closed by a later
    * event, plus final sessions whose timeout (last-event ms + gap) fell
    * strictly before the final watermark.
    */
  private val sessionizeLateOracleSql: String =
    s"""WITH $lateWaveCtes,
       |surv AS (SELECT * FROM s WHERE wm_us IS NULL OR tus >= wm_us),
       |p AS (SELECT user_id, tsv, event_id, value, wv,
       |        lag(tsv) OVER (PARTITION BY user_id ORDER BY wv, tsv, event_id) AS prev_ts
       |      FROM surv),
       |g AS (SELECT *, CASE WHEN prev_ts IS NULL
       |          OR epoch_ms(tsv) - epoch_ms(prev_ts) >= 1800000 THEN 1 ELSE 0 END AS new_session
       |      FROM p),
       |h AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id
       |        ORDER BY wv, tsv, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
       |      FROM g),
       |sess AS (SELECT user_id, session_seq,
       |    first(tsv ORDER BY wv, tsv, event_id) AS session_start,
       |    last(tsv ORDER BY wv, tsv, event_id) AS session_end,
       |    count(*) AS n_events,
       |    SUM(value ORDER BY wv, tsv, event_id) AS total_value
       |  FROM h GROUP BY 1, 2),
       |lastq AS (SELECT user_id, MAX(session_seq) AS mx FROM sess GROUP BY 1)
       |SELECT s2.user_id, CAST(s2.session_start AS TIMESTAMP) AS session_start,
       |  CAST(s2.session_end AS TIMESTAMP) AS session_end,
       |  s2.n_events, s2.total_value
       |FROM sess s2 JOIN lastq l ON s2.user_id = l.user_id, fw
       |WHERE s2.session_seq < l.mx
       |   OR epoch_us(s2.session_end) // 1000 + 1800000 < fw.f // 1000""".stripMargin

  /** DuckDB replica of the streaming-incremental dedup ingest
    * (shared by the live gate and the crash-restart gate, which must
    * converge to the identical accepted set): wave 0 (even ids)
    * self-dedups, its survivors' index becomes the state; wave 1 (odd
    * ids) pairs against that state plus itself. Sizes always come from
    * the wave-local window (the Spark side attaches nsh at batch-index
    * build).
    */
  private val incrementalLiveOracleSql: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |         i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
        |       FROM t),
        |esh AS (SELECT * FROM sh WHERE doc_id % 2 = 0),
        |osh AS (SELECT * FROM sh WHERE doc_id % 2 <> 0),
        |eidx AS (SELECT doc_id, shingle FROM esh WHERE shingle NOT IN (
        |           SELECT shingle FROM esh GROUP BY 1 HAVING count(*) > 100)),
        |oidx AS (SELECT doc_id, shingle FROM osh WHERE shingle NOT IN (
        |           SELECT shingle FROM osh GROUP BY 1 HAVING count(*) > 100)),
        |esz AS (SELECT doc_id, count(*) AS nsh FROM eidx GROUP BY 1),
        |osz AS (SELECT doc_id, count(*) AS nsh FROM oidx GROUP BY 1),
        |ep AS (SELECT b.doc_id AS doc_b FROM eidx a JOIN eidx b
        |         ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |       GROUP BY a.doc_id, b.doc_id
        |       HAVING CAST(count(*) AS DOUBLE) /
        |         ((SELECT nsh FROM esz WHERE doc_id = a.doc_id)
        |          + (SELECT nsh FROM esz WHERE doc_id = b.doc_id) - count(*)) >= 0.5),
        |acc0 AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0
        |         AND doc_id NOT IN (SELECT doc_b FROM ep)),
        |sidx AS (SELECT e.doc_id, e.shingle FROM eidx e JOIN acc0 USING (doc_id)),
        |op AS (SELECT b.doc_id AS doc_b FROM oidx a JOIN oidx b
        |         ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |       GROUP BY a.doc_id, b.doc_id
        |       HAVING CAST(count(*) AS DOUBLE) /
        |         ((SELECT nsh FROM osz WHERE doc_id = a.doc_id)
        |          + (SELECT nsh FROM osz WHERE doc_id = b.doc_id) - count(*)) >= 0.5),
        |cp AS (SELECT b.doc_id AS doc_b FROM sidx a JOIN oidx b ON a.shingle = b.shingle
        |       GROUP BY a.doc_id, b.doc_id
        |       HAVING CAST(count(*) AS DOUBLE) /
        |         ((SELECT nsh FROM esz WHERE doc_id = a.doc_id)
        |          + (SELECT nsh FROM osz WHERE doc_id = b.doc_id) - count(*)) >= 0.5),
        |acc1 AS (SELECT doc_id FROM documents WHERE doc_id % 2 <> 0
        |         AND doc_id NOT IN (SELECT doc_b FROM op UNION SELECT doc_b FROM cp))
        |SELECT doc_id, CAST(0 AS INT) AS wave FROM acc0
        |UNION ALL
        |SELECT doc_id, CAST(1 AS INT) AS wave FROM acc1""".stripMargin

  /** DuckDB replica of the converged merge state (shared by the live and
    * multi-wave merge gates): batch last-write-wins over all events —
    * micro-batch boundaries cannot change it.
    */
  private val mergeLwwOracleSql: String =
    """WITH r AS (SELECT user_id, event_type, event_id, ts, value,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value
      |FROM r WHERE rn = 1""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "agg_distinct_tickers" -> "SELECT DISTINCT o_orderpriority FROM orders",

    "agg_group_count" ->
      "SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY 1",

    "agg_rollup_total" ->
      "SELECT o_orderstatus, count(*) AS cnt FROM orders GROUP BY ROLLUP(o_orderstatus)",

    "agg_cube" ->
      "SELECT o_orderstatus, o_orderpriority, count(*) AS cnt FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)",

    "agg_distinct_users" ->
      "SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS cnt FROM events GROUP BY 1",

    "fn_quarter_label" ->
      """SELECT CAST(year(o_orderdate) AS VARCHAR) || '-Q' || CAST(quarter(o_orderdate) AS VARCHAR) AS quarter_label,
        |  count(*) AS cnt
        |FROM orders GROUP BY 1""".stripMargin,

    "fn_parse_date_multi" ->
      """WITH b AS (
        |  SELECT o_orderkey,
        |    CASE o_orderkey % 4
        |      WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
        |      WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
        |      WHEN 2 THEN strftime(o_orderdate, '%m/%d/%Y')
        |      ELSE strftime(o_orderdate, '%Y') END AS raw
        |  FROM orders)
        |SELECT o_orderkey, raw,
        |  COALESCE(
        |    CAST(try_strptime(raw, '%Y-%m-%d') AS DATE),
        |    CAST(try_strptime(raw, '%Y-%m-%d %H:%M:%S') AS DATE),
        |    CAST(try_strptime(raw, '%m/%d/%Y') AS DATE),
        |    CASE WHEN regexp_full_match(raw, '\d{4}(\.0+)?')
        |         THEN make_date(CAST(CAST(raw AS DOUBLE) AS INT), 12, 31) END) AS parsed
        |FROM b""".stripMargin,

    "fn_parse_date_dayfirst" ->
      """WITH b AS (
        |  SELECT o_orderkey,
        |    CASE o_orderkey % 3
        |      WHEN 0 THEN strftime(o_orderdate, '%m/%d/%Y')
        |      WHEN 1 THEN strftime(o_orderdate, '%d/%m/%Y')
        |      ELSE strftime(o_orderdate, '%Y-%m-%d') END AS raw
        |  FROM orders),
        |p AS (
        |  SELECT o_orderkey, raw,
        |    COALESCE(
        |      CAST(try_strptime(raw, '%Y-%m-%d') AS DATE),
        |      CAST(try_strptime(raw, '%Y-%m-%d %H:%M:%S') AS DATE),
        |      CAST(try_strptime(raw, '%m/%d/%Y') AS DATE),
        |      CAST(try_strptime(raw, '%d/%m/%Y') AS DATE)) AS parsed
        |  FROM b)
        |SELECT o_orderkey, raw, parsed,
        |  CAST(year(parsed) AS VARCHAR) || '-Q' || CAST(quarter(parsed) AS VARCHAR) AS quarter_label
        |FROM p""".stripMargin,

    "fn_safe_decimal" ->
      """WITH b AS (
        |  SELECT o_orderkey,
        |    CASE o_orderkey % 4
        |      WHEN 0 THEN '$' || CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR)
        |      WHEN 1 THEN CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR) || ' '
        |      WHEN 2 THEN 'N/A'
        |      ELSE CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR) END AS raw
        |  FROM orders),
        |c AS (SELECT o_orderkey, regexp_replace(raw, '[,$%\s]', '', 'g') AS cl FROM b),
        |n AS (SELECT o_orderkey, CASE WHEN cl IN ('', 'N/A', 'n/a', '-') THEN NULL ELSE cl END AS cl2 FROM c),
        |v AS (SELECT o_orderkey, TRY_CAST(cl2 AS DECIMAL(21,8)) AS v FROM n)
        |SELECT o_orderkey,
        |  CAST(TRY_CAST((CASE WHEN v > 0 AND v < 1000000 THEN v * 1000000 ELSE v END) AS DECIMAL(15,2)) AS DOUBLE) AS val
        |FROM v""".stripMargin,

    "fn_estimate_eps" ->
      """WITH ni AS (
        |  SELECT n_name,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS net_income,
        |    CAST(CASE n_name WHEN 'NATION_1' THEN 3160 WHEN 'NATION_2' THEN 920
        |         WHEN 'NATION_3' THEN 1600 ELSE 1000 END AS BIGINT) AS shares
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1)
        |SELECT n_name, net_income, shares,
        |  round((CASE WHEN net_income >= 1000000 THEN net_income / 1000000 ELSE net_income END) / shares, 4) AS eps
        |FROM ni""".stripMargin,

    "fn_tolerance_check" ->
      """SELECT o_orderkey, abs(o_totalprice - 150000.0) <= 50000.0 AS within_tol
        |FROM orders WHERE o_orderkey < 50""".stripMargin,

    "fn_label_rlike" ->
      """WITH b AS (
        |  SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'bad-label'
        |    ELSE CAST(year(o_orderdate) AS VARCHAR) || '-Q' || CAST(quarter(o_orderdate) AS VARCHAR) END AS quarter_label
        |  FROM orders)
        |SELECT regexp_full_match(quarter_label, '\d{4}-Q[1-4]') AS valid, count(*) AS cnt
        |FROM b GROUP BY 1""".stripMargin,

    "project_normalize" ->
      """SELECT o_orderkey, o_orderpriority AS ticker,
        |  CAST(o_orderdate AS DATE) AS quarter_date,
        |  CAST(year(o_orderdate) AS VARCHAR) || '-Q' || CAST(quarter(o_orderdate) AS VARCHAR) AS quarter_label,
        |  CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS DOUBLE) AS revenue
        |FROM orders""".stripMargin,

    "filter_valid_date" ->
      """WITH b AS (
        |  SELECT o_orderkey,
        |    CASE o_orderkey % 4
        |      WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
        |      WHEN 1 THEN strftime(o_orderdate, '%m/%d/%Y')
        |      WHEN 2 THEN 'invalid-date'
        |      ELSE strftime(o_orderdate, '%Y-%m-%d') END AS raw
        |  FROM orders),
        |p AS (
        |  SELECT o_orderkey,
        |    COALESCE(
        |      CAST(try_strptime(raw, '%Y-%m-%d') AS DATE),
        |      CAST(try_strptime(raw, '%Y-%m-%d %H:%M:%S') AS DATE),
        |      CAST(try_strptime(raw, '%m/%d/%Y') AS DATE),
        |      CASE WHEN regexp_full_match(raw, '\d{4}(\.0+)?')
        |           THEN make_date(CAST(CAST(raw AS DOUBLE) AS INT), 12, 31) END) AS parsed
        |  FROM b)
        |SELECT o_orderkey, parsed FROM p WHERE parsed IS NOT NULL""".stripMargin,

    "filter_golden_row" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = 100",

    "join_fk_resolve" ->
      "SELECT o_orderkey, o_custkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey",

    "join_anti_new" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderdate >= '2000-01-01')""".stripMargin,

    "except_new_tickers" ->
      """SELECT c_custkey FROM customer
        |EXCEPT SELECT o_custkey AS c_custkey FROM orders WHERE o_orderdate >= '2000-01-01'""".stripMargin,

    "join_summary" ->
      """SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment,
        |  COALESCE(o.cnt, 0) AS order_cnt
        |FROM customer c
        |LEFT JOIN (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1) o
        |  ON c.c_custkey = o.o_custkey""".stripMargin,

    "join_shares_lookup" ->
      """SELECT n_nationkey, n_name,
        |  CAST(CASE n_name WHEN 'NATION_1' THEN 3160 WHEN 'NATION_2' THEN 920
        |       WHEN 'NATION_3' THEN 1600 ELSE 1000 END AS BIGINT) AS shares
        |FROM nation""".stripMargin,

    "anti_unresolved" ->
      """SELECT user_id, count(*) AS cnt FROM events
        |WHERE user_id NOT IN (SELECT c_custkey FROM customer WHERE c_custkey < 100)
        |GROUP BY 1""".stripMargin,

    "join_salted_skew" ->
      """SELECT e.user_id, e.event_id, e.value, c.c_name
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE c.c_custkey < 200""".stripMargin,

    "window_topk_quarters" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM (
        |  SELECT l_orderkey, l_linenumber, l_shipdate,
        |    row_number() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate DESC, l_linenumber) AS rn
        |  FROM lineitem) WHERE rn <= 2""".stripMargin,

    "window_running_total" ->
      """SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
        |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |FROM events""".stripMargin,

    "sort_export" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM orders
        |ORDER BY o_custkey, o_orderdate DESC, o_orderkey""".stripMargin,

    "intersect_active" ->
      """SELECT c_custkey FROM customer
        |INTERSECT SELECT o_custkey AS c_custkey FROM orders WHERE o_orderdate >= '2000-01-01'""".stripMargin,

    "text_normalize" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '[ \t\n\f\r\x0B]+', ' ', 'g'))) AS norm_md5,
        |  CAST(length(trim(regexp_replace(lower(text), '[ \t\n\f\r\x0B]+', ' ', 'g'))) AS BIGINT) AS norm_len
        |FROM documents""".stripMargin,

    "union_sources" ->
      """SELECT src, count(*) AS cnt FROM (
        |  SELECT o_orderkey, 'src_o' AS src FROM orders WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT o_orderkey, 'src_other' AS src FROM orders WHERE o_orderstatus <> 'O')
        |GROUP BY 1""".stripMargin,

    "merge_upsert" ->
      """WITH tagged AS (
        |  SELECT user_id, event_type, event_id, ts, value,
        |    CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END AS src
        |  FROM events),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY src DESC, ts DESC, event_id DESC) AS rn
        |  FROM tagged)
        |SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM ranked WHERE rn = 1""".stripMargin,

    "dedupe_batch" ->
      """SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM (
        |  SELECT user_id, event_type, event_id, ts, value, row_number() OVER (
        |    PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,

    "dedupe_dim" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 3 = 0
        |UNION ALL
        |SELECT c_custkey, c_name || '_new' AS c_name, c_acctbal FROM customer WHERE c_custkey % 3 <> 0""".stripMargin,

    "merge_partitioned" ->
      """SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM (
        |  SELECT user_id, event_type, event_id, ts, value, row_number() OVER (
        |    PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type IN ('click', 'view', 'purchase')) WHERE rn = 1""".stripMargin,

    "assert_unique_key" ->
      """SELECT user_id, event_type, count(*) AS cnt FROM events
        |GROUP BY 1, 2 HAVING count(*) > 1""".stripMargin,

    "csv_roundtrip" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |  CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS DOUBLE) AS o_price, o_orderstatus
        |FROM orders""".stripMargin,

    "partitioned_state_prune" ->
      """SELECT o_orderkey, o_custkey, CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS DOUBLE) AS o_price, o_orderstatus
        |FROM orders WHERE o_orderstatus = 'O'""".stripMargin,

    "jdbc_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS cnt,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY 1""".stripMargin,

    "jdbc_merge_upsert" ->
      """SELECT c_custkey, c_name || '_u' AS c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 0
        |UNION ALL
        |SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey % 3 = 0 AND c_custkey % 2 <> 0""".stripMargin,

    "events_tumbling" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type, count(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "streaming_tumbling_live" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
        |  count(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2
        |HAVING CAST(date_trunc('hour', ts) AS TIMESTAMP) + INTERVAL 1 HOUR
        |  <= (SELECT max(CAST(ts AS TIMESTAMP)) FROM events)""".stripMargin,

    "events_sliding" ->
      """SELECT CAST(ws AS TIMESTAMP) AS win_start, event_type, count(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
        |                 date_trunc('hour', ts)]) AS ws,
        |         event_type, value
        |  FROM events)
        |GROUP BY 1, 2""".stripMargin,

    "asof_join" ->
      """SELECT l.event_id, l.user_id, CAST(l.ts AS TIMESTAMP) AS ts,
        |  (SELECT r.value FROM events r
        |   WHERE r.event_type = 'purchase' AND r.user_id = l.user_id AND r.ts <= l.ts
        |   ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS purchase_value
        |FROM events l WHERE l.event_type = 'click'""".stripMargin,

    "asof_join_forward" ->
      """SELECT l.event_id, l.user_id, CAST(l.ts AS TIMESTAMP) AS ts,
        |  (SELECT r.value FROM events r
        |   WHERE r.event_type = 'purchase' AND r.user_id = l.user_id AND r.ts >= l.ts
        |   ORDER BY r.ts ASC, r.event_id ASC LIMIT 1) AS purchase_value
        |FROM events l WHERE l.event_type = 'click'""".stripMargin,

    // The correlated twin selects the SAME nearest row, then nulls its
    // value past the tolerance — matching the matched-row-struct gating.
    "asof_join_tolerance" ->
      """SELECT l.event_id, l.user_id, CAST(l.ts AS TIMESTAMP) AS ts,
        |  (SELECT CASE WHEN abs(epoch_ms(l.ts) - epoch_ms(r.ts)) <= 600000
        |            THEN r.value END
        |   FROM events r
        |   WHERE r.event_type = 'purchase' AND r.user_id = l.user_id AND r.ts <= l.ts
        |   ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS purchase_value
        |FROM events l WHERE l.event_type = 'click'""".stripMargin,

    "json_props_extract" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin,

    "events_sessionize" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_id, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |g AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_ms(ts) - epoch_ms(prev_ts) >= 1800000 THEN 1 ELSE 0 END AS new_session
        |  FROM f),
        |h AS (
        |  SELECT user_id, ts, event_id, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM g)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  CAST(MIN(ts) AS TIMESTAMP) AS session_start,
        |  CAST(MAX(ts) AS TIMESTAMP) AS session_end,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM h GROUP BY 1, 2""".stripMargin,

    "sql_revenue_rollup" ->
      """SELECT n_name,
        |  CAST(year(o_orderdate) AS VARCHAR) || '-Q' || CAST(quarter(o_orderdate) AS VARCHAR) AS quarter_label,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS revenue,
        |  count(*) AS order_cnt
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2""".stripMargin,

    "text_stats" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS n_subwords
        |FROM documents""".stripMargin,

    "text_langid" -> {
      val toks = "regexp_split_to_array(trim(text), '\\s+')"
      val hits = TextAnalysis.StopwordLists.map { case (lang, words) =>
        s"${hitsSql(toks, words)} AS h_$lang"
      }.mkString(",\n    ")
      val langs = TextAnalysis.StopwordLists.map(_._1)
      val best = s"greatest(${langs.map(l => s"h_$l").mkString(", ")})"
      val cases = langs.map(l => s"WHEN h_$l = best THEN '$l'").mkString(" ")
      s"""WITH b AS (
         |  SELECT doc_id,
         |    $hits
         |  FROM documents),
         |m AS (SELECT doc_id, $best AS best, * FROM b)
         |SELECT doc_id, CASE WHEN best = 0 THEN 'und' $cases ELSE 'und' END AS lang_guess
         |FROM m""".stripMargin
    },

    "text_quality" ->
      s"WITH $qualityCte SELECT doc_id, quality FROM q",

    "text_fingerprint" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
        |s AS (SELECT doc_id, toks,
        |        list_distinct(list_transform(range(1, len(toks) - 1),
        |          i -> array_to_string(toks[i:i+2], ' '))) AS sh
        |      FROM t)
        |SELECT doc_id,
        |  md5(array_to_string(toks, ' ')) AS fingerprint,
        |  CASE WHEN len(sh) > 0 THEN list_min(list_transform(sh, x -> md5(x)))
        |       ELSE md5(array_to_string(toks, ' ')) END AS rolling_fp
        |FROM s""".stripMargin,

    "profile_orders" ->
      """WITH b AS (SELECT o_custkey, CAST(o_totalprice AS DECIMAL(15,2)) AS o_price, o_orderstatus FROM orders)
        |SELECT 'o_custkey' AS "column", count(*) AS n_rows,
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  count(DISTINCT o_custkey) AS n_distinct,
        |  CAST(min(o_custkey) AS VARCHAR) AS min_str, CAST(max(o_custkey) AS VARCHAR) AS max_str FROM b
        |UNION ALL
        |SELECT 'o_price', count(*),
        |  CAST(sum(CASE WHEN o_price IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_price),
        |  CAST(min(o_price) AS VARCHAR), CAST(max(o_price) AS VARCHAR) FROM b
        |UNION ALL
        |SELECT 'o_orderstatus', count(*),
        |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT o_orderstatus),
        |  CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR) FROM b""".stripMargin,

    "profile_quantiles" ->
      """WITH q AS (SELECT o_orderstatus,
        |    quantile_cont(o_totalprice, 0.25) AS q25,
        |    quantile_cont(o_totalprice, 0.5) AS q50,
        |    quantile_cont(o_totalprice, 0.75) AS q75
        |  FROM orders GROUP BY 1)
        |SELECT o_orderstatus, CAST(0.25 AS DOUBLE) AS prob, round(q25, 6) AS q_value FROM q
        |UNION ALL SELECT o_orderstatus, CAST(0.5 AS DOUBLE), round(q50, 6) FROM q
        |UNION ALL SELECT o_orderstatus, CAST(0.75 AS DOUBLE), round(q75, 6) FROM q""".stripMargin,

    "corpus_clean" -> {
      val toks = "regexp_split_to_array(trim(text), '\\s+')"
      val hits = TextAnalysis.StopwordLists.map { case (lang, words) =>
        s"${hitsSql(toks, words)} AS h_$lang"
      }.mkString(", ")
      val langs = TextAnalysis.StopwordLists.map(_._1)
      val best = s"greatest(${langs.map(l => s"h_$l").mkString(", ")})"
      val cases = langs.map(l => s"WHEN h_$l = $best THEN '$l'").mkString(" ")
      s"""WITH h AS (
         |  SELECT doc_id, text,
         |    CAST(length(text) AS DOUBLE) AS n_char,
         |    CAST(len($toks) AS DOUBLE) AS n_tok,
         |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
         |    CAST(${hitsSql(toks, EnWords)} AS DOUBLE) AS en_hits,
         |    $hits
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, text,
         |    CASE WHEN $best = 0 THEN 'und' $cases ELSE 'und' END AS lang_guess,
         |    round(
         |        (CASE WHEN n_char > 0 THEN n_alpha / n_char ELSE 0.0 END) * 0.4
         |      + (CASE WHEN n_tok > 0 THEN en_hits / n_tok ELSE 0.0 END) * 0.3
         |      + least(n_tok / 100.0, 1.0) * 0.3, 6) AS quality
         |  FROM h),
         |kept AS (SELECT * FROM scored WHERE lang_guess = 'en' AND quality >= 0.45),
         |fp AS (SELECT doc_id, text, lang_guess, quality,
         |         md5(array_to_string($toks, ' ')) AS fp FROM kept),
         |keepers AS (SELECT fp, min(doc_id) AS keeper FROM fp GROUP BY 1),
         |ae AS (SELECT f.doc_id, f.text, f.lang_guess, f.quality
         |       FROM fp f JOIN keepers k ON f.fp = k.fp WHERE f.doc_id = k.keeper),
         |t2 AS (SELECT doc_id, $toks AS toks FROM ae),
         |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
         |         i -> array_to_string(toks[i:i+2], ' ')))) AS shingle FROM t2),
         |hot AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) > 100),
         |idx AS (SELECT doc_id, shingle FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
         |sizes AS (SELECT doc_id, count(*) AS nsh FROM idx GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
         |          FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |near_losers AS (
         |  SELECT DISTINCT db AS doc_id FROM pairs
         |  JOIN sizes sa ON da = sa.doc_id
         |  JOIN sizes sb ON db = sb.doc_id
         |  WHERE CAST(i AS DOUBLE) / (sa.nsh + sb.nsh - i) >= 0.5)
         |SELECT doc_id, lang_guess, quality FROM ae
         |WHERE doc_id NOT IN (SELECT doc_id FROM near_losers)""".stripMargin
    },

    "text_top_tokens" ->
      """WITH c AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents),
        |g AS (SELECT token, count(*) AS cnt FROM c GROUP BY 1),
        |r AS (SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rank FROM g)
        |SELECT token, cnt, rank FROM r WHERE rank <= 20""".stripMargin,

    "text_idf" ->
      """WITH d AS (
        |  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS token
        |  FROM documents),
        |g AS (SELECT token, count(*) AS df FROM d GROUP BY 1)
        |SELECT token, df,
        |  round(ln((SELECT CAST(count(*) AS DOUBLE) FROM documents) / df), 6) AS idf
        |FROM g""".stripMargin,

    "dedup_exact" ->
      """SELECT fingerprint, count(*) AS cnt, min(doc_id) AS keeper FROM (
        |  SELECT doc_id,
        |    md5(array_to_string(regexp_split_to_array(trim(text), '\s+'), ' ')) AS fingerprint
        |  FROM documents)
        |GROUP BY 1""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH ${jaccardPairsCte()}
         |SELECT doc_a, doc_b, jaccard FROM jpairs""".stripMargin,

    // Streaming-incremental replica: wave 0 (even ids) self-dedups, its
    // survivors' index becomes the state; wave 1 (odd ids) pairs against
    // that state plus itself. Sizes always come from the wave-local
    // window (the Spark side attaches nsh at batch-index build).
    "streaming_dedup_incremental_live" -> incrementalLiveOracleSql,
    // Crash + replay must converge to the UNINTERRUPTED run's result —
    // the whole point of the replay-safe sink. Same oracle by
    // construction.
    "streaming_dedup_restart" -> incrementalLiveOracleSql,

    // Incremental replica: per-half indexes with per-half hot caps
    // (matching the Spark side's independently-built state/batch
    // indexes), batch self-pairs plus state x batch cross pairs.
    "dedup_incremental" -> incrementalPairsOracleSql,

    // Same oracle by construction: compacting the persisted state tables
    // (ops/Compact rewrite + swap) must be result-transparent — only the
    // file layout changes, never a row.
    "dedup_incremental_compacted" -> incrementalPairsOracleSql,

    // Full-recompute reachability fixpoint over the incremental pair
    // semantics (history-internal pairs under the history hot cap, plus
    // the batch self/cross pairs of the dedup_incremental replica) — a
    // hash match proves the contracted-graph fold equals recomputing CC
    // over history ∪ batch.
    "dedup_cluster_reps_incremental" -> incrementalClusterRepsOracleSql,

    // The live streaming twin reconstructs the identical labeling.
    "streaming_cluster_labels_live" -> incrementalClusterRepsOracleSql,


    // Reachability fixpoint over the same pair graph: min reachable id
    // per node == the propagation-converged representative.
    "dedup_cluster_reps" ->
      s"WITH RECURSIVE $clusterRepsCte SELECT doc_id, rep FROM lbl",

    // Canonical copy per cluster: the fixpoint labels joined to the
    // quality replica, top-1 per rep by (quality DESC, doc_id).
    "dedup_canonical_quality" ->
      s"""WITH RECURSIVE $clusterRepsCte,
         |$qualityCte,
         |jq AS (SELECT lbl.rep, lbl.doc_id, q.quality
         |       FROM lbl JOIN q ON lbl.doc_id = q.doc_id),
         |r AS (SELECT rep, doc_id, quality,
         |        row_number() OVER (PARTITION BY rep
         |          ORDER BY quality DESC, doc_id) AS rn
         |      FROM jq)
         |SELECT rep, doc_id AS canonical_id, quality AS canonical_quality
         |FROM r WHERE rn = 1""".stripMargin,

    // Cluster-keyed split: the fixpoint labels bucketed by the same md5
    // hash as sample_hash_split, keyed on the REPRESENTATIVE id.
    "sample_split_leakage_safe" ->
      s"""WITH RECURSIVE $clusterRepsCte
         |SELECT doc_id, rep,
         |  CASE WHEN ${md5Hash60Sql("CAST(rep AS VARCHAR)")} % 10000 < 8000 THEN 'train'
         |       WHEN ${md5Hash60Sql("CAST(rep AS VARCHAR)")} % 10000 < 9000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM lbl""".stripMargin,

    "sim_brute_topk" -> bruteTopKOracleSql,

    // Quantization replicated per vec_quantize_int8; the int-code dot is
    // exact in double (|products| <= 127^2 * dim), so the recall ranking
    // matches bit-for-bit, and the rescore reuses the float cosine.
    "sim_quantized_rescore" -> quantizedRescoreOracleSql,

    "recall_ivf_topk" -> topKRecallOracleSql(ivfOracleSql),
    "recall_quantized_rescore" -> topKRecallOracleSql(quantizedRescoreOracleSql),
    "recall_embedding_lsh" ->
      pairRecallOracleSql(embeddingLshOracleSql(), embeddingExactPairsOracleSql()),
    "recall_embedding_lsh_sampled" -> {
      val sampleWhere =
        s"\n           WHERE ${md5Hash60Sql("CAST(vec_id AS VARCHAR)")} % 10000 < 5000"
      pairRecallOracleSql(embeddingLshOracleSql(sampleWhere),
        embeddingExactPairsOracleSql(sampleWhere))
    },
    "recall_minhash_lsh" ->
      pairRecallOracleSql(minHashLshOracleSql(),
        s"WITH ${jaccardPairsCte()} SELECT doc_a, doc_b FROM jpairs"),
    "recall_minhash_lsh_sampled" -> {
      val sampleWhere =
        s"\n       WHERE ${md5Hash60Sql("CAST(doc_id AS VARCHAR)")} % 10000 < 5000"
      pairRecallOracleSql(minHashLshOracleSql(sampleWhere),
        s"WITH ${jaccardPairsCte(sampleWhere)} SELECT doc_a, doc_b FROM jpairs")
    },

    "sim_brute_topk_agg" -> bruteTopKOracleSql,

    "dedup_embedding" -> embeddingExactPairsOracleSql(),

    "sql_graft_dot" ->
      """SELECT vec_id,
        |  round(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |                         list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS self_dot
        |FROM embeddings WHERE vec_id < 100""".stripMargin,

    "multimodal_frames" ->
      """WITH b AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |f AS (SELECT doc_id, text, unnest(range(0, n // 32)) AS frame_idx FROM b WHERE n >= 32)
        |SELECT doc_id, frame_idx,
        |  md5(substring(text, CAST(frame_idx * 32 + 1 AS INT), 32)) AS frame_hash
        |FROM f""".stripMargin,

    // Spark's fixed HLL++ estimate is deterministic, so the tolerance
    // check is a stable boolean; the oracle emits the expected TRUE.
    "agg_approx_distinct" ->
      """SELECT event_type, TRUE AS within_tol, CAST(0 AS BIGINT) AS err_bucket,
        |  count(DISTINCT user_id) AS exact_users
        |FROM events GROUP BY 1""".stripMargin,

    // The DSv2 source must surface exactly the staged bronze rows for the
    // un-pruned symbols — replicated from the orders-derived fixture.
    "source_http_dsv2" ->
      """WITH src AS (SELECT o_orderkey, o_orderdate, o_orderkey % 4 AS m,
        |    'TK' || CAST(o_orderkey % 5 AS VARCHAR) AS symbol,
        |    CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR) AS num_s
        |  FROM orders WHERE o_orderkey < 2000)
        |SELECT
        |  CASE WHEN m = 1 THEN ''
        |       WHEN m = 3 THEN strftime(o_orderdate, '%m/%d/%Y')
        |       ELSE strftime(o_orderdate, '%Y-%m-%d') END AS "date",
        |  symbol,
        |  CASE WHEN m = 2 THEN 'N/A' ELSE num_s END AS revenue,
        |  CASE WHEN m = 3 THEN '' ELSE num_s END AS eps
        |FROM src WHERE symbol <> 'TK4'""".stripMargin,

    // HTTP transport must surface the SAME rows as the file transport —
    // the loopback server serves the identical staging, and the injected
    // first-attempt 500 per symbol must be absorbed by the retry.
    "source_http_live" ->
      """WITH src AS (SELECT o_orderkey, o_orderdate, o_orderkey % 4 AS m,
        |    'TK' || CAST(o_orderkey % 5 AS VARCHAR) AS symbol,
        |    CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR) AS num_s
        |  FROM orders WHERE o_orderkey < 2000)
        |SELECT
        |  CASE WHEN m = 1 THEN ''
        |       WHEN m = 3 THEN strftime(o_orderdate, '%m/%d/%Y')
        |       ELSE strftime(o_orderdate, '%Y-%m-%d') END AS "date",
        |  symbol,
        |  CASE WHEN m = 2 THEN 'N/A' ELSE num_s END AS revenue,
        |  CASE WHEN m = 3 THEN '' ELSE num_s END AS eps
        |FROM src WHERE symbol <> 'TK4'""".stripMargin,

    // REAL-codec gates: the fixture parameters (dims, formats, pattern
    // pixels/samples) are pure functions of doc_id, so the oracle derives
    // what the JDK decoder must read back — if ImageIO/AudioSystem ever
    // decoded differently, these rows would mismatch.
    "multimodal_decode_real" ->
      """SELECT doc_id,
        |  CAST(16 + doc_id % 49 AS INT) AS width,
        |  CAST(16 + (doc_id * 3) % 33 AS INT) AS height,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
        |FROM documents""".stripMargin,

    // Exact gray-pattern lane sums over the lossless PNG tier:
    // gray(x, y) = (x*31 + y*17 + doc_id) mod 256, lane = x mod 8.
    "multimodal_features_real" ->
      """WITH d AS (SELECT doc_id, 16 + doc_id % 49 AS w, 16 + (doc_id * 3) % 33 AS h
        |           FROM documents WHERE doc_id % 2 = 0),
        |px AS (SELECT doc_id, h, unnest(range(0, w)) AS x FROM d),
        |pxy AS (SELECT doc_id, x, unnest(range(0, h)) AS y FROM px),
        |s AS (SELECT doc_id, x % 8 AS j,
        |        SUM((x * 31 + y * 17 + doc_id) % 256) AS f
        |      FROM pxy GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(MAX(CASE WHEN j = 0 THEN f END) AS BIGINT) AS f0,
        |  CAST(MAX(CASE WHEN j = 1 THEN f END) AS BIGINT) AS f1,
        |  CAST(MAX(CASE WHEN j = 2 THEN f END) AS BIGINT) AS f2,
        |  CAST(MAX(CASE WHEN j = 3 THEN f END) AS BIGINT) AS f3,
        |  CAST(MAX(CASE WHEN j = 4 THEN f END) AS BIGINT) AS f4,
        |  CAST(MAX(CASE WHEN j = 5 THEN f END) AS BIGINT) AS f5,
        |  CAST(MAX(CASE WHEN j = 6 THEN f END) AS BIGINT) AS f6,
        |  CAST(MAX(CASE WHEN j = 7 THEN f END) AS BIGINT) AS f7
        |FROM s GROUP BY 1""".stripMargin,

    // Animated-GIF frame sampling: frames 0, 2, 4 of the nf = 2 + id%4
    // frame clip; 8-bit gray round-trips the GIF palette losslessly, so
    // the per-frame gray sum is exact: sum over (x, y) of
    // (x*31 + y*17 + doc_id + frame*53) mod 256.
    "multimodal_frames_real" ->
      """WITH d AS (SELECT doc_id, 2 + doc_id % 4 AS nf,
        |             16 + doc_id % 17 AS w, 16 + (doc_id * 3) % 13 AS h
        |           FROM documents),
        |fr AS (SELECT doc_id, nf, w, h, unnest(range(0, nf, 2)) AS frame_idx FROM d),
        |px AS (SELECT doc_id, nf, w, h, frame_idx, unnest(range(0, w)) AS x FROM fr),
        |pxy AS (SELECT doc_id, nf, w, h, frame_idx, x, unnest(range(0, h)) AS y FROM px)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(SUM((x * 31 + y * 17 + doc_id + frame_idx * 53) % 256) AS BIGINT) AS gray_sum,
        |  CAST(nf AS INT) AS n_frames
        |FROM pxy GROUP BY doc_id, frame_idx, w, h, nf""".stripMargin,

    "multimodal_resize_real" ->
      """SELECT doc_id,
        |  CAST(greatest((16 + doc_id % 49) // 2, 1) AS INT) AS resized_width,
        |  CAST(greatest((16 + (doc_id * 3) % 33) // 2, 1) AS INT) AS resized_height,
        |  TRUE AS has_payload
        |FROM documents""".stripMargin,

    // WAV fixture: n = 800 + doc_id mod 800 samples of
    // s(i) = ((i*7 + doc_id) mod 4001) - 2000 at 8 kHz PCM16 mono.
    "multimodal_audio_meta" ->
      """WITH d AS (SELECT doc_id, 800 + doc_id % 800 AS n FROM documents),
        |i AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
        |s AS (SELECT doc_id,
        |        CAST(SUM((i * 7 + doc_id) % 4001 - 2000) AS BIGINT) AS sample_sum
        |      FROM i GROUP BY 1)
        |SELECT d.doc_id, CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
        |  CAST(16 AS INT) AS bits, CAST(d.n AS BIGINT) AS n_samples, s.sample_sum
        |FROM d JOIN s ON d.doc_id = s.doc_id""".stripMargin,

    // The stub decode dims are a pure function of payload byte length
    // (documents.text is ASCII: strlen == byte count).
    "multimodal_decode_meta" ->
      """WITH d AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n FROM documents)
        |SELECT doc_id, n % 640 + 1 AS width, (n * 7) % 480 + 1 AS height,
        |  CASE n % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
        |  n AS n_bytes
        |FROM d""".stripMargin,

    // Position-weighted byte sums per lane, mod 1000003 — exact integer
    // math replicated from the bytes (ord == byte value on ASCII text).
    "multimodal_features" ->
      """WITH d AS (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS n FROM documents),
        |pos AS (SELECT doc_id, unnest(range(1, n + 1)) AS i, text FROM d),
        |s AS (SELECT doc_id, (i - 1) % 8 AS j,
        |        SUM(ord(substring(text, CAST(i AS INT), 1)) * i) AS sj
        |      FROM pos GROUP BY 1, 2),
        |grid AS (SELECT doc_id, unnest(range(0, 8)) AS j FROM d),
        |f AS (SELECT g.doc_id, g.j, CAST(COALESCE(s.sj, 0) % 1000003 AS BIGINT) AS fj
        |      FROM grid g LEFT JOIN s ON g.doc_id = s.doc_id AND g.j = s.j),
        |v AS (SELECT doc_id, list(fj ORDER BY j) AS fl FROM f GROUP BY 1)
        |SELECT d.doc_id,
        |  md5(array_to_string(list_transform(v.fl, x -> CAST(x AS VARCHAR)), ',')) AS features_md5,
        |  d.n AS orig_bytes,
        |  (d.n + 3) // 4 AS resized_bytes
        |FROM d JOIN v ON d.doc_id = v.doc_id""".stripMargin,

    "dedup_minhash_lsh" -> minHashLshOracleSql(),

    "dedup_simhash" -> simHashOracleSql,

    "sim_ivf_topk" -> ivfOracleSql,
    "sim_ivf_topk_bulk" -> ivfOracleSql,

    "dedup_embedding_lsh" -> embeddingLshOracleSql(),

    "dedup_embedding_incremental" -> incrementalEmbeddingLshOracleSql,

    "fn_coalesce_truthy" ->
      """WITH b AS (SELECT o_orderkey,
        |  CASE o_orderkey % 4 WHEN 0 THEN NULL WHEN 1 THEN '' WHEN 2 THEN '0'
        |    ELSE CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR) END AS a
        |  FROM orders)
        |SELECT o_orderkey,
        |  CASE WHEN a IS NULL OR a = '' OR COALESCE(TRY_CAST(a AS DOUBLE) = 0, FALSE)
        |       THEN 'fallback' ELSE a END AS chosen
        |FROM b""".stripMargin,

    "quality_quarantine" ->
      """WITH b AS (SELECT
        |    CASE WHEN o_orderkey % 5 = 0 THEN 'bad-label'
        |      ELSE CAST(year(o_orderdate) AS VARCHAR) || '-Q' || CAST(quarter(o_orderdate) AS VARCHAR) END AS quarter_label,
        |    CASE WHEN o_orderkey % 7 = 0 THEN '' ELSE o_orderpriority END AS ticker
        |  FROM orders)
        |SELECT CASE WHEN regexp_full_match(quarter_label, '\d{4}-Q[1-4]')
        |         AND length(ticker) BETWEEN 1 AND 10 THEN 'clean' ELSE 'quarantine' END AS bucket,
        |  count(*) AS cnt
        |FROM b GROUP BY 1""".stripMargin,

    "merge_touched" ->
      """WITH tagged AS (SELECT user_id, event_type, event_id, ts, value,
        |    CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END AS src FROM events),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY src DESC, ts DESC, event_id DESC) AS rn FROM tagged)
        |SELECT user_id, event_type, event_id, src = 1 AS touched
        |FROM ranked WHERE rn = 1""".stripMargin,

    "fn_ticker_valid" ->
      """WITH b AS (SELECT CASE WHEN o_orderkey % 3 = 0 THEN ''
        |    WHEN o_orderkey % 3 = 1 THEN 'VERYLONGTICKER' ELSE o_orderpriority END AS ticker
        |  FROM orders)
        |SELECT length(ticker) BETWEEN 1 AND 10 AS valid, count(*) AS cnt
        |FROM b GROUP BY 1""".stripMargin,

    "fn_name_default" ->
      """SELECT n_nationkey, n_name,
        |  CASE WHEN n_name = 'NATION_1' THEN 'First Nation Motors'
        |       ELSE n_name || ' Inc' END AS company_name
        |FROM nation""".stripMargin,

    "metrics_listener" ->
      """SELECT TRUE AS captured,
        |  CAST((SELECT count(DISTINCT o_orderstatus) FROM orders) AS BIGINT) AS n_groups""".stripMargin,

    "pipeline_income_normalize" ->
      s"""${incomeNormalizeCte(badDates = false)}
         |SELECT symbol AS ticker, quarter_date, quarter_label,
         |  CAST(revenue_dec AS DOUBLE) AS revenue,
         |  CAST(COALESCE(eps_direct, eps_est) AS DOUBLE) AS eps,
         |  CAST(gp_dec AS DOUBLE) AS gross_profit
         |FROM c3""".stripMargin,

    "pipeline_estimates_normalize" -> {
      s"""WITH src AS (
         |  SELECT o_orderkey, o_orderdate, o_orderkey % 4 AS m,
         |    'TK' || CAST(o_orderkey % 5 AS VARCHAR) AS symbol,
         |    CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR) AS num_s
         |  FROM orders WHERE o_orderkey < 2000),
         |b AS (SELECT *,
         |    CAST(try_strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE) AS quarter_date,
         |    CASE WHEN m = 0 THEN 'bogus' ELSE num_s END AS est_eps_s,
         |    CASE WHEN m = 1 THEN '-3' ELSE '7' END AS cnt_s
         |  FROM src),
         |c1 AS (SELECT *, ${safeDecimalSql("num_s")} AS er_sd FROM b),
         |c2 AS (SELECT *,
         |    CAST(year(quarter_date) AS VARCHAR) || '-Q' || CAST(quarter(quarter_date) AS VARCHAR) AS quarter_label,
         |    ${millionsSql("er_sd")} AS er_dec,
         |    TRY_CAST(est_eps_s AS DECIMAL(10,4)) AS ee_dec,
         |    TRY_CAST(cnt_s AS INT) AS cnt_i
         |  FROM c1)
         |SELECT symbol AS ticker, quarter_date, quarter_label,
         |  CAST(er_dec AS DOUBLE) AS estimated_revenue,
         |  CAST(ee_dec AS DOUBLE) AS estimated_eps,
         |  CAST(CASE WHEN cnt_i >= 0 THEN cnt_i END AS BIGINT) AS analyst_count
         |FROM c2""".stripMargin
    },

    "pipeline_run_state" ->
      s"""${incomeNormalizeCte(badDates = true)},
         |valid AS (SELECT * FROM c3 WHERE quarter_date IS NOT NULL
         |    AND regexp_full_match(quarter_label, '\\d{4}-Q[1-4]')
         |    AND length(symbol) BETWEEN 1 AND 10),
         |f0 AS (SELECT symbol AS ticker, quarter_date, quarter_label,
         |    revenue_dec, COALESCE(eps_direct, eps_est) AS eps_dec, gp_dec FROM valid),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY ticker, quarter_date
         |    ORDER BY revenue_dec DESC NULLS LAST, eps_dec DESC NULLS LAST,
         |             gp_dec DESC NULLS LAST, quarter_label ASC) AS rn
         |  FROM f0)
         |SELECT ticker, quarter_date, quarter_label,
         |  CAST(revenue_dec AS DOUBLE) AS revenue,
         |  CAST(eps_dec AS DOUBLE) AS eps,
         |  CAST(gp_dec AS DOUBLE) AS gross_profit
         |FROM ranked WHERE rn = 1""".stripMargin,

    "sample_hash_split" ->
      s"""WITH b AS (SELECT doc_id,
         |  ${md5Hash60Sql("CAST(doc_id AS VARCHAR)")} % 10000 AS bucket
         |  FROM documents)
         |SELECT doc_id,
         |  CASE WHEN bucket < 8000 THEN 'train' WHEN bucket < 9000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b""".stripMargin,

    "sample_mixture" -> mixtureOracleSql,

    "sample_stratified" ->
      s"""WITH b AS (SELECT doc_id, lang,
         |  ${md5Hash60Sql("CAST(doc_id AS VARCHAR)")} % 10000 AS bucket
         |  FROM documents)
         |SELECT lang, count(*) AS cnt FROM b
         |WHERE bucket < (CASE lang WHEN 'en' THEN 10000 WHEN 'zh' THEN 5000
         |  ELSE 2500 END)
         |GROUP BY 1""".stripMargin,

    "text_pattern_counts" -> {
      // DuckDB standard strings keep backslashes literal — embed the Java
      // regex as-is (the FilterPatterns subset is Java/RE2-identical).
      val cols = TextAnalysis.FilterPatterns.map { case (name, p) =>
        s"len(regexp_extract_all(text, '${p.replace("'", "''")}')) AS n_$name"
      }.mkString(",\n  ")
      s"SELECT doc_id,\n  $cols\nFROM documents"
    },

    "text_redact" ->
      """WITH f AS (SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com via https://www.Example'
        |      || doc_id || '.com/a id 90000' || doc_id AS text
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<email>', 'g'),
        |    'https?://[^\s]+', '<url>', 'g'),
        |    '[0-9]{6,}', '<long_digits>', 'g') AS redacted
        |FROM f""".stripMargin,

    "text_url_hosts" ->
      """WITH f AS (SELECT doc_id,
        |    text || ' see https://www.Mirror' || (doc_id % 7) || '.net/x and http://cdn'
        |      || (doc_id % 3) || '.example.org:8080/y' AS text
        |  FROM documents),
        |h AS (SELECT doc_id,
        |    list_transform(regexp_extract_all(text, 'https?://([^/\s:]+)', 1),
        |      x -> regexp_replace(lower(x), '^www\.', '')) AS hosts
        |  FROM f)
        |SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS url_idx, u.x AS host
        |FROM (SELECT doc_id,
        |        unnest(list_transform(hosts, (x, i) -> {'x': x, 'i': i})) AS u
        |      FROM h)""".stripMargin,

    "text_chunks" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |s AS (SELECT doc_id, toks,
        |    unnest(generate_series(0, len(toks) - 1, 16)) AS start
        |  FROM t)
        |SELECT doc_id,
        |  CAST(start // 16 AS BIGINT) AS chunk_idx,
        |  CAST(len(toks[start + 1 : start + 32]) AS BIGINT) AS n_toks,
        |  md5(array_to_string(toks[start + 1 : start + 32], ' ')) AS chunk_digest
        |FROM s""".stripMargin,

    "text_remove_boilerplate" ->
      """WITH f AS (SELECT doc_id,
        |    concat_ws(chr(10), 'nav: ' || source, text,
        |              '(c) footer ' || lang, 'unsubscribe here') AS text
        |  FROM documents),
        |l AS (SELECT doc_id, u.x AS line, u.i AS pos
        |  FROM (SELECT doc_id,
        |          unnest(list_transform(string_split(text, chr(10)),
        |            (x, i) -> {'x': x, 'i': i})) AS u
        |        FROM f)),
        |b AS (SELECT k FROM (
        |    SELECT DISTINCT doc_id, trim(line) AS k FROM l WHERE trim(line) <> '')
        |  GROUP BY k HAVING count(*) >= 10),
        |kept AS (SELECT l.doc_id,
        |    string_agg(l.line, chr(10) ORDER BY l.pos) AS clean_text,
        |    count(*) AS n_kept_lines
        |  FROM l LEFT JOIN b ON trim(l.line) = b.k
        |  WHERE b.k IS NULL GROUP BY l.doc_id)
        |SELECT f.doc_id,
        |  COALESCE(kept.clean_text, '') AS clean_text,
        |  CAST(COALESCE(kept.n_kept_lines, 0) AS BIGINT) AS n_kept_lines,
        |  CAST(len(string_split(f.text, chr(10)))
        |       - COALESCE(kept.n_kept_lines, 0) AS BIGINT) AS n_removed_lines
        |FROM f LEFT JOIN kept ON f.doc_id = kept.doc_id""".stripMargin,

    "join_bloom_pruned" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(l_quantity AS DOUBLE) AS quantity,
        |  CAST(o_totalprice AS DOUBLE) AS o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'""".stripMargin,

    "contamination_report" ->
      """WITH fp AS (SELECT doc_id,
        |    md5(array_to_string(regexp_split_to_array(trim(text), '\s+'), ' ')) AS fp
        |  FROM documents),
        |cg AS (SELECT fp, count(*) AS n_matches, min(doc_id) AS first_match
        |  FROM fp GROUP BY 1)
        |SELECT b.doc_id AS bench_id, COALESCE(cg.n_matches, 0) AS n_matches, cg.first_match
        |FROM fp b LEFT JOIN cg ON b.fp = cg.fp
        |WHERE b.doc_id % 10 = 0""".stripMargin,

    "unpivot_wide_long" ->
      """UNPIVOT (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS m_totalprice,
        |  CAST(o_custkey AS DOUBLE) AS m_custkey FROM orders)
        |ON m_totalprice, m_custkey INTO NAME metric VALUE value""".stripMargin,

    // pivot(unpivot(wide)) is the identity on the wide table.
    "pivot_long_wide" ->
      """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS m_totalprice,
        |  CAST(o_custkey AS DOUBLE) AS m_custkey FROM orders""".stripMargin,

    // Token/bigram repetition signals replicated with list lambdas over
    // the same tokenization.
    "text_repetition" ->
      """WITH t AS (SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN []
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, toks, len(toks) AS nt,
        |    CASE WHEN len(toks) >= 2
        |      THEN list_transform(generate_series(1, len(toks) - 1),
        |             i -> toks[i] || ' ' || toks[i + 1])
        |      ELSE [] END AS bi
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN nt > 0
        |    THEN round(1 - CAST(len(list_distinct(toks)) AS DOUBLE) / nt, 6)
        |    ELSE 0.0 END AS repetition_ratio,
        |  CASE WHEN len(bi) > 0
        |    THEN round(CAST(list_max(list_transform(list_distinct(bi),
        |           g -> len(list_filter(bi, x -> x = g)))) AS DOUBLE) / len(bi), 6)
        |    ELSE 0.0 END AS top_bigram_frac
        |FROM s""".stripMargin,

    // floor(x*scale + 0.5) quantization codes are exact double arithmetic
    // in both engines (float -> double widening is lossless).
    "vec_quantize_int8" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |m AS (SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e),
        |sc AS (SELECT vec_id, v,
        |    CASE WHEN maxabs > 0 THEN 127.0 / maxabs ELSE 0.0 END AS scale FROM m),
        |q AS (SELECT vec_id, scale,
        |    list_transform(v, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS qv
        |  FROM sc)
        |SELECT vec_id, round(scale, 6) AS scale_r6,
        |  md5(array_to_string(list_transform(qv, x -> CAST(x AS VARCHAR)), ',')) AS q_md5,
        |  CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT) AS n_sat
        |FROM q""".stripMargin,

    // The bin-join is graded against the plain theta-join semantics.
    "interval_join_sessions" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_ms(ts) - epoch_ms(prev_ts) >= 1800000 THEN 1 ELSE 0 END AS new_session
        |  FROM f),
        |h AS (
        |  SELECT user_id, ts, event_id,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM g),
        |sess AS (
        |  SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |    MIN(ts) AS session_start, MAX(ts) AS session_end
        |  FROM h GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts, s.session_seq
        |FROM events e JOIN sess s
        |  ON e.user_id = s.user_id
        | AND e.ts >= s.session_start AND e.ts <= s.session_end""".stripMargin,

    "cap_per_key" ->
      """WITH r AS (SELECT user_id, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |FROM r WHERE rn <= 5""".stripMargin,

    // Bucketing changes the physical layout only; results match the plain
    // join over the source tables.
    "join_bucketed" ->
      """SELECT c_nationkey, count(*) AS order_cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,

    // merge(summarize(b1..b3)) == summarize(all): the oracle is the
    // single-shot aggregate the incremental state must reproduce.
    "incremental_rollup" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_v,
        |  CAST(MIN(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS min_v,
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS max_v
        |FROM orders GROUP BY 1""".stripMargin,

    // Single-shot replica of the merged HDR sketch: identical integer
    // bucketing (msb via length(bin()), shift, integer-compare rank
    // selection), so p50/p90 match bit-for-bit; the tolerance columns are
    // the literal-TRUE tripwire.
    "incremental_quantiles" ->
      """WITH src AS (SELECT o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |b AS (SELECT o_orderstatus, cents,
        |        greatest(length(bin(cents)) - 1 - 4, 0) AS shift FROM src),
        |h AS (SELECT o_orderstatus, shift * 16 + (cents >> shift) AS bucket,
        |        count(*) AS cnt
        |      FROM b GROUP BY 1, 2),
        |n AS (SELECT o_orderstatus, CAST(SUM(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
        |c AS (SELECT o_orderstatus, bucket, cnt,
        |        SUM(cnt) OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS cum
        |      FROM h),
        |sel AS (SELECT c.o_orderstatus, n.n,
        |          MIN(CASE WHEN cum * 2 >= n * 1 THEN bucket END) AS b50,
        |          MIN(CASE WHEN cum * 10 >= n * 9 THEN bucket END) AS b90
        |        FROM c JOIN n ON c.o_orderstatus = n.o_orderstatus GROUP BY 1, 2)
        |SELECT o_orderstatus, n,
        |  CASE WHEN b50 < 32 THEN b50
        |       ELSE ((b50 - (b50 // 16 - 1) * 16 + 1) << (b50 // 16 - 1)) - 1 END AS p50_cents,
        |  CASE WHEN b90 < 32 THEN b90
        |       ELSE ((b90 - (b90 // 16 - 1) * 16 + 1) << (b90 // 16 - 1)) - 1 END AS p90_cents,
        |  TRUE AS p50_within_tol, TRUE AS p90_within_tol
        |FROM sel""".stripMargin,

    // Spark's t-digest estimate is deterministic; the oracle emits the
    // expected TRUE/0 next to the exact median it can compute itself.
    "profile_quantiles_approx" ->
      """SELECT o_orderstatus, TRUE AS within_tol, CAST(0 AS BIGINT) AS err_bucket,
        |  round(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 6) AS exact_med
        |FROM orders GROUP BY 1""".stripMargin,

    // All four rules re-derived from the same tokenization; pass_lang is
    // h_en = best AND best > 0 (en wins ties, so that IS langId == 'en').
    "corpus_filter_report" -> {
      val toks = "regexp_split_to_array(trim(text), '\\s+')"
      val hits = TextAnalysis.StopwordLists.map { case (lang, words) =>
        s"${hitsSql(toks, words)} AS h_$lang"
      }.mkString(",\n    ")
      val best = s"greatest(${TextAnalysis.StopwordLists.map(l => s"h_${l._1}").mkString(", ")})"
      s"""WITH b AS (
         |  SELECT doc_id, text,
         |    CAST(length(text) AS DOUBLE) AS n_char,
         |    CAST(len($toks) AS DOUBLE) AS n_tok,
         |    CAST(len(list_distinct($toks)) AS DOUBLE) AS n_tok_distinct,
         |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
         |    $hits
         |  FROM documents),
         |m AS (SELECT *, $best AS best,
         |    round(
         |      (CASE WHEN n_char > 0 THEN n_alpha / n_char ELSE 0.0 END) * 0.4
         |    + (CASE WHEN n_tok > 0 THEN h_en / n_tok ELSE 0.0 END) * 0.3
         |    + least(n_tok / 100.0, 1.0) * 0.3, 6) AS quality,
         |    CASE WHEN n_tok > 0 THEN 1 - n_tok_distinct / n_tok ELSE 0.0 END AS rep
         |  FROM b)
         |SELECT doc_id,
         |  (h_en = best AND best > 0) AS pass_lang,
         |  quality >= 0.45 AS pass_quality,
         |  rep < 0.6 AS pass_repetition,
         |  len(regexp_extract_all(text, '[0-9]{6,}')) = 0 AS pass_no_digit_runs,
         |  (h_en = best AND best > 0) AND quality >= 0.45 AND rep < 0.6
         |    AND len(regexp_extract_all(text, '[0-9]{6,}')) = 0 AS keep
         |FROM m""".stripMargin
    },

    // Shard-local running sums replicated with the md5-derived shard hash.
    "pack_chunks" ->
      s"""WITH d AS (SELECT doc_id,
         |    CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
         |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens,
         |    ${md5Hash60Sql("CAST(doc_id AS VARCHAR)")} % 8 AS shard
         |  FROM documents),
         |c AS (SELECT *, SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d)
         |SELECT doc_id, shard, n_tokens,
         |  CAST(cum - n_tokens AS BIGINT) AS start_offset,
         |  CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 512) AS BIGINT) AS start_chunk,
         |  CAST(CASE WHEN n_tokens = 0 THEN floor(CAST(cum - n_tokens AS DOUBLE) / 512)
         |       ELSE floor(CAST(cum - 1 AS DOUBLE) / 512) END AS BIGINT) AS end_chunk
         |FROM c""".stripMargin,

    // event_id is unique, so watermarked dedup emits every event exactly
    // once -> the oracle is the full projection.
    "streaming_dedup_live" ->
      """SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
        |FROM events""".stripMargin,

    // Emitted sessions = sessions closed by a later event PLUS final
    // sessions whose event-time timeout (last event ms + gap) fell
    // STRICTLY before the final watermark (max event ms) — Spark's
    // timeout predicate is `timeoutTimestamp < watermark`. Final
    // sessions at or within the gap of the stream's max timestamp stay
    // open. total_value replicated as DuckDB's ordered SUM (same left
    // fold).
    "streaming_sessionize_live" -> sessionizeEmittedOracleSql,
    // Multi-wave delivery emits the SAME session set (see the gate).
    "streaming_sessionize_waves" -> sessionizeEmittedOracleSql,


    // The streaming merge converges to the batch last-write-wins dedup
    // regardless of micro-batch boundaries.
    "streaming_merge_live" -> mergeLwwOracleSql,
    // Micro-batch boundaries (three waves here) cannot change the state.
    "streaming_merge_waves" -> mergeLwwOracleSql,

    // Late/out-of-order delivery: watermark semantics graded for real —
    // beyond-watermark rows dropped, in-watermark late rows folded, the
    // per-wave watermark sequence replicated in SQL.
    "streaming_tumbling_late" -> tumblingLateOracleSql,
    "streaming_sessionize_late" -> sessionizeLateOracleSql,
    // No watermark on the merge path: out-of-order delivery must
    // CONVERGE — precedence is a total order, so displaced rows cannot
    // change the winner per key.
    "streaming_merge_late" -> mergeLwwOracleSql,

    // AvailableNow drains the source before the watermark can evict
    // unmatched state, so the live join emits exactly the batch theta-join.
    "streaming_join_live" ->
      """SELECT c.event_id AS click_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS click_ts,
        |  p.event_id AS purchase_id, CAST(p.ts AS TIMESTAMP) AS purchase_ts,
        |  p.value AS purchase_value
        |FROM events c JOIN events p
        |  ON c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.user_id = c.user_id
        | AND p.ts <= c.ts AND p.ts >= c.ts - INTERVAL 1 HOUR""".stripMargin,

    // Late-delivery interval join. The join's global watermark is the
    // MIN over the two sides' per-operator maxima (each side only sees
    // its own event_type), with the same two-wave lag and ms flooring as
    // the shared late CTEs. A delivered row is dropped iff its raw event
    // time is behind the watermark in force at its delivered wave; a
    // surviving pair is emitted iff BOTH endpoints survived their own
    // delivery-time filter. State eviction needs no modeling: a
    // surviving click has click_ts >= wm(v) >= every earlier eviction
    // bound, and its purchases sit >= click_ts - 1h >= wm - 1h, above
    // the purchase-side bound; symmetrically for late purchases — so no
    // needed row is ever evicted before its partner arrives at these
    // wave/watermark parameters.
    "streaming_join_late" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value,
        |        CAST(ts AS TIMESTAMP) AS tsv, epoch_ns(ts) AS tns,
        |        epoch_us(CAST(ts AS TIMESTAMP)) AS tus
        |      FROM events),
        |b AS (SELECT min(tns) AS tmin, max(tns) - min(tns) + 1 AS span FROM e),
        |d AS (SELECT e.*,
        |        CASE WHEN event_id % 10 = 0
        |             THEN least(CAST(((tns - b.tmin) * 4) // b.span AS INT) + 2, 3)
        |             ELSE CAST(((tns - b.tmin) * 4) // b.span AS INT) END AS wv
        |      FROM e, b),
        |m AS (SELECT wv,
        |        max(CASE WHEN event_type = 'click' THEN tus END) AS mxc,
        |        max(CASE WHEN event_type = 'purchase' THEN tus END) AS mxp
        |      FROM d GROUP BY wv),
        |w AS (SELECT wv,
        |        (least(max(mxc) OVER lag2, max(mxp) OVER lag2) // 1000
        |          - 345600000) * 1000 AS wm_us
        |      FROM m
        |      WINDOW lag2 AS (ORDER BY wv
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)),
        |s AS (SELECT d.*, w.wm_us FROM d JOIN w ON d.wv = w.wv),
        |surv AS (SELECT * FROM s WHERE wm_us IS NULL OR tus >= wm_us)
        |SELECT c.event_id AS click_id, c.user_id, c.tsv AS click_ts,
        |  p.event_id AS purchase_id, p.tsv AS purchase_ts,
        |  p.value AS purchase_value
        |FROM surv c JOIN surv p
        |  ON c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.user_id = c.user_id
        | AND p.tsv <= c.tsv AND p.tsv >= c.tsv - INTERVAL 1 HOUR""".stripMargin
  )
}
