package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Heavy hitters: the Misra–Gries sketch is a candidate superset under
  * any partitioning, and the two-pass operator's output equals the naive
  * exact plan bit-for-bit — on a skewed corpus whose cardinality far
  * exceeds the sketch size (so decrement and merge-trim paths really
  * run).
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish stream: item i appears ~N/(i+1) times, plus a long unique
    * tail — ~4k distinct items, heavily skewed head.
    */
  private lazy val skewed = {
    val head = (0 until 50).flatMap(i => Seq.fill(2000 / (i + 1))(i.toLong))
    val tail = (1000L until 5000L).map(identity)
    (head ++ tail).toDF("item")
  }

  private def naive(num: Long, den: Long) =
    skewed.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(skewed.agg(count(lit(1)).as("total"))))
      .where(col("cnt") * lit(den) >= col("total") * lit(num))
      .select(col("item"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("two-pass heavy hitters == naive exact plan on a skewed corpus") {
    val expected = naive(1L, 100L)
    assert(expected.nonEmpty && expected.size < 60) // the cut discriminates
    for (parts <- Seq(1, 3, 16)) {
      val got = Profile.heavyHitters(skewed.repartition(parts), "item", 1L, 100L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("sketch with k << cardinality still yields the exact answer") {
    // slack=2 with den/num=20 -> k=40 counters vs ~4k distinct items:
    // the decrement-on-overflow and merge-trim paths are exercised, and
    // the superset guarantee must still hold so pass 2 stays exact.
    val expected = naive(1L, 20L)
    val got = Profile.heavyHitters(skewed.repartition(8), "item", 1L, 20L, slack = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("MG estimates are within n/(k+1) of true counts, never above") {
    import graft.functions.HeavyHittersAggregate.misraGries
    val n = skewed.count()
    val k = 64
    val est = skewed.repartition(7)
      .agg(misraGries(col("item"), k).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = skewed.groupBy("item").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    est.foreach { case (item, e) =>
      val t = truth(item)
      assert(e <= t, s"overestimate for $item: $e > $t")
      assert(t - e <= n / (k + 1) * 2 + 1, // merge tree depth 2: map + final
        s"error for $item: ${t - e} > bound")
    }
    // Superset at the guaranteed threshold: every item with true count
    // >= n/(k+1) must appear among the sketch's counters.
    truth.filter(_._2 >= n / (k + 1)).keys.foreach { item =>
      assert(est.contains(item), s"guaranteed item $item missing")
    }
  }

  test("string items: two-pass == naive, sketch keys survive buffer reuse") {
    // Many distinct strings per partition with small k forces stored
    // UTF8String keys to outlive the row buffer they were read from —
    // a missing copy shows up as corrupted/duplicated keys here.
    val words = skewed.select(concat(lit("w"), col("item")).as("w"))
    val expected = words.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(words.agg(count(lit(1)).as("total"))))
      .where(col("cnt") * lit(20) >= col("total") * lit(1))
      .select(col("w"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    val got = Profile.heavyHitters(words.repartition(8), "w", 1L, 20L, slack = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("rejects degenerate fractions") {
    intercept[IllegalArgumentException](Profile.heavyHitters(skewed, "item", 0L, 10L))
    intercept[IllegalArgumentException](Profile.heavyHitters(skewed, "item", 3L, 2L))
    intercept[IllegalArgumentException](Profile.heavyHitters(skewed, "item", 1L, 10L, slack = 1))
  }

  test("refuses thresholds that would clamp k and void the superset guarantee") {
    // den/num * slack > MaxCounters: must require-fail, never silently
    // clamp (a clamped sketch can drop true heavy hitters).
    val e = intercept[IllegalArgumentException](
      Profile.heavyHitters(skewed, "item", 1L, Profile.MaxCounters, slack = 4))
    assert(e.getMessage.contains("superset"))
    // ...including when den/num * slack would overflow Long.
    intercept[IllegalArgumentException](
      Profile.heavyHitters(skewed, "item", 1L, Long.MaxValue / 2, slack = 4))
  }

  test("incremental sketch fold resolves to the single-shot exact answer") {
    // Three disjoint waves folded through hhSummarize/hhMerge, resolved
    // against the full corpus — must equal the naive exact plan. k is
    // sized for the 3-fold error budget but still << cardinality, so the
    // weighted re-sketch's decrement path really runs.
    val expected = naive(1L, 20L)
    assert(expected.nonEmpty)
    val k = 20 * 16
    val waves = (0 until 3).map(i =>
      skewed.where(pmod(col("item"), lit(3)) === i).repartition(4))
    val state = waves.tail.foldLeft(Profile.hhSummarize(waves.head, "item", k))(
      (st, b) => Profile.hhMerge(st, Profile.hhSummarize(b, "item", k), k))
    // Exact totals survive the fold even though counter estimates don't.
    val srow = state.select(col("total"), col("nulls")).head()
    assert(srow.getLong(0) == skewed.count() && srow.getLong(1) == 0L)
    val got = Profile.hhResolve(skewed, state, "item", 1L, 20L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("weighted Misra-Gries: replaying (item, est) counters preserves the superset bound") {
    import graft.functions.HeavyHittersAggregate.{misraGries, misraGriesWeighted}
    val n = skewed.count()
    val k = 64
    // Re-sketching a k-counter sketch through weighted adds must keep
    // every item whose true count >= 2n/(k+1) (one extra n/(k+1) of
    // error for the second level).
    val sketch1 = skewed.repartition(5).agg(misraGries(col("item"), k).as("s"))
    val resketched = sketch1.select(explode(col("s")).as("e"))
      .select(col("e.item"), col("e.est"))
      .agg(misraGriesWeighted(col("item"), col("est"), k).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = skewed.groupBy("item").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    resketched.foreach { case (item, e) =>
      assert(e <= truth(item), s"overestimate for $item")
    }
    truth.filter(_._2 >= 3 * n / (k + 1)).keys.foreach { item =>
      assert(resketched.contains(item), s"guaranteed item $item lost in re-sketch")
    }
  }

  test("graft_misra_gries is callable from SQL, weighted and unweighted") {
    graft.functions.GraftFunctions.register(spark)
    skewed.createOrReplaceTempView("hh_sql_probe")
    val unweighted = spark.sql(
      "SELECT graft_misra_gries(item, 5000) AS s FROM hh_sql_probe")
      .select(explode(col("s")).as("e")).select(col("e.item"), col("e.est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = skewed.groupBy("item").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unweighted == truth) // k >= cardinality (~4050): the sketch IS exact
    val weighted = spark.sql(
      "SELECT graft_misra_gries(item, 2 * item, 5000) AS s FROM hh_sql_probe")
      .select(explode(col("s")).as("e")).select(col("e.item"), col("e.est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(weighted == truth.collect { case (i, c) if i > 0 => i -> 2 * i * c })
  }

  test("hhMergeAll folds N wave states in one level; wave replay cannot double-count") {
    import java.nio.file.Files
    val k = 20 * 16
    val statePath = Files.createTempDirectory("graft_hh_state").toString + "/state"
    def writeWave(w: Int, slice: org.apache.spark.sql.DataFrame): Unit =
      Profile.hhSummarize(slice, "item", k)
        .withColumn("wave", lit(w))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("wave").parquet(statePath)
    val waves = (0 until 3).map(i => skewed.where(pmod(col("item"), lit(3)) === i))
    waves.zipWithIndex.foreach { case (s, w) => writeWave(w, s) }
    // At-least-once replay: wave 1 written AGAIN — dynamic overwrite must
    // replace, not append, so totals and counters stay single-counted.
    writeWave(1, waves(1))
    val state = spark.read.parquet(statePath).select(col("cand"), col("total"), col("nulls"))
    assert(state.count() == 3L)
    val folded = Profile.hhMergeAll(state, k)
    assert(folded.select(col("total")).head().getLong(0) == skewed.count())
    val got = Profile.hhResolve(skewed, folded, "item", 1L, 20L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive(1L, 20L))
  }

  test("empty batches: summarize/fold/resolve stay total-0, never null (advice r9)") {
    // sum(when(...)) over an empty batch is NULL; the state must carry
    // exact zeros instead, and a 0-row state must resolve to no hitters.
    val empty = spark.range(0).select(col("id").as("item"))
    val s = Profile.hhSummarize(empty, "item", 8).head()
    assert(s.getLong(1) == 0L && s.getLong(2) == 0L)
    // Folding an empty summary into a real state keeps exact counts.
    val folded = Profile.hhMergeAll(
      Profile.hhSummarize(skewed, "item", 64)
        .unionByName(Profile.hhSummarize(empty, "item", 64)), 64)
    val f = folded.head()
    assert(f.getLong(1) == skewed.count() && f.getLong(2) == 0L)
    // Resolve against an empty corpus + empty-batch state: empty result.
    assert(Profile.hhResolve(empty, Profile.hhSummarize(empty, "item", 8),
      "item", 1L, 20L).count() == 0L)
    // A 0-ROW state (nothing ever summarized) resolves empty, not a throw.
    assert(Profile.hhResolve(skewed, Profile.hhSummarize(empty, "item", 8).limit(0),
      "item", 1L, 20L).count() == 0L)
    // End-to-end: heavyHitters over an empty corpus returns empty.
    assert(Profile.heavyHitters(empty, "item", 1L, 20L).count() == 0L)
  }

  test("a frequent NULL group is reported, matching the naive plan") {
    // The sketch skips nulls and the semi-join can't match them; the
    // operator must still surface the NULL group exactly as
    // groupBy(item).count.filter(...) would.
    val withNulls = skewed
      .union(Seq.fill(400)(Option.empty[Long]).toDF("item"))
    val expected = withNulls.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(withNulls.agg(count(lit(1)).as("total"))))
      .where(col("cnt") * lit(50) >= col("total") * lit(1))
      .select(col("item"), col("cnt"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1))).toSet
    assert(expected.exists(_._1.isEmpty), "fixture must make NULL a heavy hitter")
    val got = Profile.heavyHitters(withNulls.repartition(8), "item", 1L, 50L)
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1))).toSet
    assert(got == expected)
    // An infrequent NULL group stays out, like any other item under the cut.
    val fewNulls = skewed.union(Seq.fill(3)(Option.empty[Long]).toDF("item"))
    val gotFew = Profile.heavyHitters(fewNulls.repartition(8), "item", 1L, 50L)
      .collect()
    assert(!gotFew.exists(_.isNullAt(0)))
  }
}
