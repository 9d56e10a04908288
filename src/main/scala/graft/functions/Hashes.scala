package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The engine's two term-hash configurations, shared by every family that
  * hashes keys or terms (dedup sketches, sampling buckets): a single
  * definition so the default can never silently diverge between
  * operator families.
  */
object Hashes {

  /** xxhash64 — fastest, codegen'd; the production default. */
  val XxHash64: Column => Column = (c: Column) => xxhash64(c)

  /** 60-bit md5-derived hash with an exact DuckDB twin
    * (`CAST('0x' || substr(md5(s),1,15) AS BIGINT)`): positive, fits a
    * Long, lets an independent engine replicate signatures and buckets
    * bit-for-bit. Slower than xxhash64 — the verification configuration.
    */
  val Md5Hash60: Column => Column =
    (c: Column) => conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)
}
