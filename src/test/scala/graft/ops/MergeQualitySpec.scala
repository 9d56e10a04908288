package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MergeQualitySpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (String, String, Double, Int)*) =
    rows.toDF("ticker", "quarter", "revenue", "prio")

  test("lastWriteWins keeps exactly one deterministic row per key") {
    val df = batch(("TSLA", "2025-Q1", 1.0, 1), ("TSLA", "2025-Q1", 2.0, 2),
      ("RIVN", "2025-Q1", 3.0, 1))
    val got = Merge.lastWriteWins(df, Seq("ticker", "quarter"), Seq(col("prio").desc))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSet
    assert(got == Set(("TSLA", 2.0), ("RIVN", 3.0)))
  }

  test("mergeUpsert: incoming beats current on key collision; union otherwise") {
    val current = batch(("TSLA", "2025-Q1", 1.0, 1), ("LCID", "2025-Q1", 5.0, 1))
    val incoming = batch(("TSLA", "2025-Q1", 9.0, 1), ("RIVN", "2025-Q1", 3.0, 1))
    val merged = Merge.mergeUpsert(current, incoming, Seq("ticker", "quarter"))
    val got = merged.collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(got == Map("TSLA" -> 9.0, "LCID" -> 5.0, "RIVN" -> 3.0))
  }

  test("mergeUpsert idempotence: merge(merge(s,b),b) == merge(s,b)") {
    val current = batch(("TSLA", "2025-Q1", 1.0, 1))
    val b = batch(("TSLA", "2025-Q1", 9.0, 2), ("RIVN", "2025-Q1", 3.0, 1))
    val once = Merge.mergeUpsert(current, b, Seq("ticker", "quarter"), Seq(col("prio").desc))
    val twice = Merge.mergeUpsert(once, b, Seq("ticker", "quarter"), Seq(col("prio").desc))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("insertIfAbsent: existing rows win unchanged (ON CONFLICT DO NOTHING)") {
    val existing = batch(("TSLA", "2025-Q1", 1.0, 1))
    val incoming = batch(("TSLA", "2025-Q1", 9.0, 1), ("RIVN", "2025-Q1", 3.0, 1))
    val got = Merge.insertIfAbsent(existing, incoming, Seq("ticker"))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(got == Map("TSLA" -> 1.0, "RIVN" -> 3.0))
  }

  test("mergeIntoPartitionedState rewrites only touched partitions") {
    val statePath = java.nio.file.Files.createTempDirectory("pmerge").toString + "/state"
    val seed = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
      .toDF("k", "part", "v")
    seed.write.partitionBy("part").parquet(statePath)
    val filesBefore = {
      val dirA = new java.io.File(s"$statePath/part=A")
      dirA.listFiles().map(f => f.getName -> f.lastModified()).toMap
    }
    val batch = Seq((2L, "B", 99.0), (4L, "B", 40.0)).toDF("k", "part", "v")
    val merged = Merge.mergeIntoPartitionedState(spark, statePath, batch,
      Seq("k"), Seq(col("v").desc), "part")
    val got = merged.select("k", "part", "v").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got == Map(1L -> (("A", 10.0)), 2L -> (("B", 99.0)),
      3L -> (("C", 30.0)), 4L -> (("B", 40.0))))
    val filesAfter = {
      val dirA = new java.io.File(s"$statePath/part=A")
      dirA.listFiles().map(f => f.getName -> f.lastModified()).toMap
    }
    assert(filesBefore == filesAfter, "untouched partition files must not be rewritten")
  }

  test("mergeIntoPartitionedState keeps existing null-partition state rows") {
    val statePath = java.nio.file.Files.createTempDirectory("pmerge_null").toString + "/state"
    val seed = Seq((1L, Option("A"), 10.0), (2L, Option.empty[String], 20.0),
      (3L, Option.empty[String], 30.0)).toDF("k", "part", "v")
    seed.write.partitionBy("part").parquet(statePath)
    // The batch touches the null partition: existing null-partition rows
    // (k=2, k=3) must survive the merge — isin(null) alone would drop
    // them while dynamic overwrite still rewrites the default partition.
    val batch = Seq((2L, Option.empty[String], 99.0)).toDF("k", "part", "v")
    val merged = Merge.mergeIntoPartitionedState(spark, statePath, batch,
      Seq("k"), Seq(col("v").desc), "part")
    val got = merged.select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 10.0, 2L -> 99.0, 3L -> 30.0))
  }

  test("state bootstrap: missing path is first-run-empty, corrupt state FAILS the merge") {
    val base = java.nio.file.Files.createTempDirectory("graft_bootstrap").toString
    val schema = batch().schema
    // Missing path -> empty frame (genuine first run).
    val empty = Merge.readStateOrEmpty(spark, s"$base/nope", schema)
    assert(empty.count() == 0 && empty.schema == schema)
    // Existing-but-unreadable state (garbage where parquet footers should
    // be) must throw — empty-initializing here would let the subsequent
    // overwrite destroy the real state table.
    val corrupt = new java.io.File(s"$base/corrupt")
    corrupt.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$base/corrupt/part-00000.parquet"), "not parquet at all")
    val thrown = intercept[Exception] {
      Merge.readStateOrEmpty(spark, s"$base/corrupt", schema).count()
    }
    assert(thrown != null)
  }

  test("tolerance check edges (reference test_edge_cases.py:320-348)") {
    // revenue 22500000000.01 passes at tol 22500000 (0.1% of 22.5e9)
    val got = Seq(22500000000.01, 22522500000.01, 0.399999999)
      .toDF("v")
      .select(
        Quality.withinTolerance(col("v"), lit(22500000000.0), lit(22500000.0)).as("rev_ok"),
        Quality.withinTolerance(col("v"), lit(0.40), lit(0.01)).as("eps_ok"))
      .collect()
    assert(got(0).getBoolean(0))      // within 0.1%
    assert(!got(1).getBoolean(0))     // just past tolerance
    assert(got(2).getBoolean(1))      // 0.399999999 within 0.01 of 0.40
  }

  test("withinTolerance is false (not null) for null actuals (load.py:272)") {
    val got = Seq[java.lang.Double](null).toDF("v")
      .select(Quality.withinTolerance(col("v"), lit(1.0), lit(0.1)).as("ok"))
      .collect()
    assert(!got(0).getBoolean(0))
  }

  test("label and ticker validation (config.py:82-84)") {
    val got = Seq(("2025-Q1", "TSLA"), ("2025-Q5", "TSLA"), ("25-Q1", ""),
      ("2025-Q4", "ABCDEFGHIJK"))
      .toDF("label", "ticker")
      .select(Quality.labelValid(col("label")).as("lv"),
        Quality.tickerValid(col("ticker")).as("tv"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    assert(got.toSeq == Seq((true, true), (false, true), (false, false), (true, false)))
  }

  test("duplicateKeys finds only violated keys") {
    val df = batch(("TSLA", "2025-Q1", 1.0, 1), ("TSLA", "2025-Q1", 2.0, 2),
      ("RIVN", "2025-Q1", 3.0, 1))
    val dups = Quality.duplicateKeys(df, Seq("ticker", "quarter")).collect()
    assert(dups.length == 1 && dups(0).getString(0) == "TSLA" && dups(0).getLong(2) == 2L)
  }

  test("quarantine splits without losing rows; null predicate goes to quarantine") {
    val df = Seq(("a", java.lang.Double.valueOf(1.0)), ("b", null),
      ("c", java.lang.Double.valueOf(-1.0))).toDF("k", "v")
    val (clean, bad) = Quality.quarantine(df, col("v") > 0)
    assert(clean.collect().map(_.getString(0)).toSet == Set("a"))
    assert(bad.collect().map(_.getString(0)).toSet == Set("b", "c"))
  }

  test("topKPerGroup keeps k rows per group in order") {
    val df = Seq(("a", 1), ("a", 3), ("a", 2), ("b", 9)).toDF("g", "v")
    val got = Windows.topKPerGroup(df, Seq("g"), Seq(col("v").desc), 2)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got == Set(("a", 3), ("a", 2), ("b", 9)))
  }

  test("dimFactCounts keeps zero-fact dims (load.py:236-241)") {
    val dim = Seq((1, "x"), (2, "y")).toDF("id", "name")
    val facts = Seq((1, "f1"), (1, "f2")).toDF("fid", "payload")
    val got = Summary.dimFactCounts(dim, facts, "id", "fid", "cnt")
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(got == Map(1 -> 2L, 2 -> 0L))
  }

  test("winsorize clamps per group at the interpolated percentiles; nulls pass through") {
    // Group a: values 0..10 -> p10 = 1.0, p90 = 9.0 (linear interpolation
    // on the sorted values); group b is untouched by a's tail.
    val df = ((0 to 10).map(v => ("a", Some(v.toDouble))) ++
      Seq(("a", None), ("b", Some(100.0)), ("b", Some(200.0)))).toDF("g", "v")
    val got = Quality.winsorize(df, "v", Seq("g"), lo = 0.1, hi = 0.9)
      .collect().map(r => (r.getString(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    val a = got.filter(_._1 == "a")
    assert(a.filter(_._2.isDefined).forall { case (_, Some(v), Some(w)) =>
      w == math.min(math.max(v, 1.0), 9.0); case _ => false })
    assert(a.exists { case (_, v, w) => v.isEmpty && w.isEmpty }) // null passes through
    val b = got.filter(_._1 == "b").map(t => (t._2.get, t._3.get)).toSet
    assert(b == Set((100.0, 110.0), (200.0, 190.0))) // b's own p10/p90 band
    intercept[IllegalArgumentException](
      Quality.winsorize(df, "v", Seq("g"), lo = 0.9, hi = 0.1))
  }

  test("winsorize keeps null GROUP KEYS as their own clamped group (advice r9)") {
    // A null-keyed group must not vanish through the bounds join (a plain
    // equi-join never matches null keys); it clamps into its own band.
    val df = (Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)) ++
      (0 to 10).map(v => (null.asInstanceOf[String], v.toDouble))).toDF("g", "v")
    val got = Quality.winsorize(df, "v", Seq("g"), lo = 0.1, hi = 0.9)
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1), r.getDouble(2)))
    assert(got.length == 14) // no row lost
    val nullGrp = got.filter(_._1.isEmpty)
    assert(nullGrp.length == 11)
    // null group's own band: p10 = 1.0, p90 = 9.0 over 0..10
    assert(nullGrp.forall { case (_, v, w) => w == math.min(math.max(v, 1.0), 9.0) })
    // the named group is untouched by the null group's values
    // (compare at 1e-9: the interpolated percentile carries float error)
    val aClamped = got.filter(_._1.contains("a")).map(_._3).sorted.toSeq
    assert(aClamped.zip(Seq(1.2, 2.0, 2.8)).forall { case (g, e) => math.abs(g - e) < 1e-9 })
  }
}
