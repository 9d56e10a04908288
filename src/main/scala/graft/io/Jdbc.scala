package graft.io

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

import graft.ops.Merge

/** JDBC connector surface — the engine's real-database twin of the
  * reference's PostgreSQL load path (reference load.py:29-287: SQLAlchemy
  * engine, dim/fact upsert, summary read-back). Built entirely on the
  * public `DataFrameReader.jdbc` / `DataFrameWriter.jdbc` API; tested
  * against embedded Apache Derby (shipped in Spark's jar directory), and
  * url-swappable to PostgreSQL/MySQL in a real deployment — every method
  * takes the url as data.
  *
  * Scale contract (100 TB): JDBC is for BOUNDED relational state — dims,
  * fact summaries, control tables — never the corpus. Reads fan out via
  * `partitionColumn` bounds (one executor task per slice, predicate
  * pushed into each slice's WHERE); writes cap their connection count by
  * repartitioning to `maxConnections` and batch inserts (`batchsize`).
  * Upsert is the warehouse-standard two-phase shape: bulk-stage the batch
  * into a side table from the executors, then ONE set-based `MERGE INTO`
  * on the database — never a per-row executor round trip (the reference's
  * row-at-a-time conflict loop, load.py:128-154, inverted to set
  * semantics).
  */
object Jdbc {

  /** Connection properties. Derby's embedded driver lives in
    * derbytools.jar on the unmanaged classpath; other databases pass
    * their driver class. */
  def props(driver: String = "org.apache.derby.iapi.jdbc.AutoloadedDriver"): Properties = {
    val p = new Properties()
    p.setProperty("driver", driver)
    p
  }

  /** Bulk write. `maxConnections` bounds write parallelism — a thousand
    * executors must not open a thousand connections against one database;
    * `createTableColumnTypes` lets callers pin VARCHAR widths (Derby maps
    * StringType to CLOB otherwise, which cannot be compared or merged
    * on). */
  def writeTable(df: DataFrame, url: String, table: String,
                 mode: SaveMode = SaveMode.ErrorIfExists,
                 maxConnections: Int = 8,
                 batchSize: Int = 1000,
                 columnTypes: Option[String] = None): Unit = {
    // repartition, NOT coalesce: coalesce propagates upward without a
    // shuffle, so the entire producing stage would collapse onto
    // `maxConnections` tasks — at 1000-executor scale the whole upstream
    // computation would run on 8 threads. One bounding shuffle keeps
    // upstream parallelism intact and only the JDBC insert runs narrow.
    val bounded =
      if (df.rdd.getNumPartitions > maxConnections) df.repartition(maxConnections) else df
    val w = bounded.write.mode(mode).option("batchsize", batchSize.toString)
    columnTypes.fold(w)(t => w.option("createTableColumnTypes", t))
      .jdbc(url, table, props())
  }

  /** Single-slice read — bounded tables only (dim read-back,
    * load.py:229-246). */
  def readTable(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, props())

  /** Partitioned read: `numPartitions` concurrent slices over
    * `[lowerBound, upperBound)` strides of `partitionColumn` — each task
    * issues its own range-WHERE, so the scan parallelizes and the
    * database serves index ranges instead of one giant cursor. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long, upperBound: Long,
                      numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props())

  /** Set-based MERGE upsert (reference load.py:87-161 semantics —
    * last-write-wins on the natural key — with the per-row conflict loop
    * replaced by stage + one MERGE statement):
    *
    *  1. intra-batch dedup to one row per key ([[Merge.lastWriteWins]] —
    *     SQL MERGE requires a unique source, and the reference's loop
    *     implicitly kept the last row);
    *  2. bulk-stage the batch into `{table}_stage` from the executors;
    *  3. one driver-side `MERGE INTO target USING stage` — the database
    *     applies the whole batch set-at-a-time.
    *
    * Identifier quoting follows what the Spark JDBC writer created:
    * COLUMN names are dialect-quoted at CREATE (case-sensitive lowercase,
    * so the MERGE must quote them), TABLE names are passed through
    * unquoted (the database normalizes case, so the MERGE must leave them
    * unquoted too). All identifiers are validated against a plain-SQL
    * identifier shape before interpolation — table/column names here are
    * schema metadata, never untrusted row data. The stage table name is
    * suffixed per invocation so concurrent upserts against the same
    * target never race on a shared stage, and it is dropped in a
    * `finally` so a failed MERGE cannot leak it.
    */
  def mergeUpsert(spark: SparkSession, url: String, table: String,
                  incoming: DataFrame, keys: Seq[String], precedence: Seq[Column],
                  columnTypes: Option[String] = None): Unit = {
    requireIdent(table, "table")
    incoming.columns.foreach(requireIdent(_, "column"))
    keys.foreach(requireIdent(_, "key"))
    val batch = Merge.lastWriteWins(incoming, keys, precedence)
    val stage =
      table + "_stage_" + java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    writeTable(batch, url, stage, SaveMode.Overwrite, columnTypes = columnTypes)
    try {
      val sql = upsertSql(url, table, stage, batch.columns.toSeq, keys)
      withConnection(url) { conn =>
        val st = conn.createStatement()
        try st.executeUpdate(sql) finally st.close()
      }
    } finally {
      // Best-effort drop: a leaked stage table is recoverable noise; the
      // MERGE error (if any) is the one the caller must see.
      try withConnection(url) { conn =>
        val st = conn.createStatement()
        try st.executeUpdate(s"DROP TABLE $stage") finally st.close()
      } catch { case _: Exception => () }
    }
  }

  /** Dialect-aware set-based upsert statement, selected by JDBC url
    * scheme. Exposed (and unit-tested) separately from execution so the
    * PostgreSQL dialect — the reference's actual target
    * (load.py:128-154, schema.sql:30 `ON CONFLICT`) — is pinned even
    * though the container only ships embedded Derby.
    *
    *  - PostgreSQL: `INSERT ... SELECT ... ON CONFLICT (keys) DO UPDATE
    *    SET c = EXCLUDED.c` — requires the unique constraint on `keys`
    *    the reference's schema declares.
    *  - ANSI/Derby (default): `MERGE INTO target USING stage`.
    */
  def upsertSql(url: String, table: String, stage: String,
                cols: Seq[String], keys: Seq[String]): String = {
    val q: String => String = c => "\"" + c + "\""
    val nonKey = cols.filterNot(keys.contains)
    if (url.startsWith("jdbc:postgresql:"))
      s"""INSERT INTO $table (${cols.map(q).mkString(", ")})
         |SELECT ${cols.map(q).mkString(", ")} FROM $stage
         |ON CONFLICT (${keys.map(q).mkString(", ")})
         |DO UPDATE SET ${nonKey.map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")}""".stripMargin
    else
      s"""MERGE INTO $table t USING $stage s
         |ON ${keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")}
         |WHEN MATCHED THEN UPDATE SET ${nonKey.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")}
         |WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")})
         |VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})""".stripMargin
  }

  private val PlainIdent = "^[A-Za-z_][A-Za-z0-9_]*$".r
  private def requireIdent(name: String, what: String): Unit =
    require(PlainIdent.findFirstIn(name).isDefined,
      s"$what '$name' is not a plain SQL identifier")

  /** Driver-side connection for the bounded DDL/MERGE statements (never
    * row data — rows move through the executor bulk paths above). */
  private def withConnection[A](url: String)(f: Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }
}
