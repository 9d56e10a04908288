package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (1L to 2000L).toDF("id")

  test("hashSplit: every row gets exactly one split; proportions track weights") {
    val split = Sampling.hashSplit(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L)
    assert(counts("train") > 1400 && counts("train") < 1800) // ~1600 ± sampling noise
    assert(counts.keySet == Set("train", "val", "test"))
  }

  test("hashSplit is deterministic and stable under repartition") {
    val a = Sampling.hashSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.5))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    val b = Sampling.hashSplit(ids.repartition(7), "id", Seq("a" -> 0.5, "b" -> 0.5))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(a == b)
  }

  test("hashSplit rejects weights that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("mixtureSample: binding group kept whole, others downsampled to their share") {
    // web 4000, books 1000, code 500 rows; targets 0.5/0.3/0.2. Binding
    // group = code (500/0.2 = 2500 < books 3333 < web 8000): mixture size
    // 2500 -> web ~1250, books ~750, code 500 (whole).
    val docs = ((1L to 4000L).map(i => (i, "web")) ++
      (4001L to 5000L).map(i => (i, "books")) ++
      (5001L to 5500L).map(i => (i, "code"))).toDF("id", "grp")
    val out = Sampling.mixtureSample(docs, "id", "grp",
      Seq("web" -> 0.5, "books" -> 0.3, "code" -> 0.2))
    val counts = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("code") == 500L, s"binding group must be kept whole: $counts")
    assert(counts("web") > 1100 && counts("web") < 1400, counts.toString)
    assert(counts("books") > 650 && counts("books") < 850, counts.toString)
    // Deterministic and stable under repartition.
    val again = Sampling.mixtureSample(docs.repartition(7), "id", "grp",
      Seq("web" -> 0.5, "books" -> 0.3, "code" -> 0.2))
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(again == out.orderBy("id").collect().map(_.getLong(0)).toSeq)
    // Groups outside the targets are dropped.
    assert(out.where(col("grp") === "other").count() == 0)
    // A missing target group fails loud, not silently empty.
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(docs, "id", "grp", Seq("web" -> 0.5, "nope" -> 0.5))
    }
  }

  test("stratifiedHashSample: rate 1.0 keeps all, rate 0 keeps none, default applies") {
    val df = Seq((1L, "keep"), (2L, "keep"), (3L, "drop"), (4L, "other"))
      .flatMap { case (base, s) => (0L until 50L).map(i => (base * 100 + i, s)) }
      .toDF("id", "src")
    val kept = Sampling.stratifiedHashSample(df, "id", "src",
      Map("keep" -> 1.0, "drop" -> 0.0), defaultRate = 0.5)
    val bySrc = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("keep") == 100L)
    assert(!bySrc.contains("drop"))
    assert(bySrc("other") > 5 && bySrc("other") < 95)
  }

  test("null keys land in one deterministic bucket under BOTH hash configs") {
    val df = Seq(Option(1L), Option(2L), Option.empty[Long], Option.empty[Long])
      .toDF("id")
    for (hashFn <- Seq(graft.functions.Hashes.XxHash64, graft.functions.Hashes.Md5Hash60)) {
      // Every null-key row gets SOME split (nothing dropped, nothing
      // silently funneled to the last split via a null when-chain)...
      val split = Sampling.hashSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.5),
        hashFn = hashFn)
      assert(split.where(col("id").isNull).count() == 2)
      val nullSplits = split.where(col("id").isNull)
        .select("split").distinct().collect().map(_.getString(0)).toSeq
      assert(nullSplits.length == 1) // ...and the SAME split for all nulls.
      // Stratified sampling keeps or drops all null-key rows together
      // (rate 1.0 -> kept, not silently dropped as in the pre-fix code).
      val kept = Sampling.stratifiedHashSample(df.withColumn("s", lit("x")),
        "id", "s", Map.empty, 1.0, hashFn = hashFn)
      assert(kept.count() == 4)
    }
  }

  test("empty input: split and sample yield empty, quantiles yield no rows, unpivot empty") {
    val empty = spark.emptyDataset[Long].toDF("id")
    assert(Sampling.hashSplit(empty, "id", Seq("a" -> 1.0)).count() == 0)
    assert(Sampling.stratifiedHashSample(empty.withColumn("s", lit("x")),
      "id", "s", Map.empty, 1.0).count() == 0)
    val emptyV = spark.emptyDataset[(String, Double)].toDF("g", "v")
    assert(Profile.quantiles(emptyV, "v", Seq("g"), Seq(0.5)).count() == 0)
    val emptyW = spark.emptyDataset[(Long, Double, Double)].toDF("id", "m_a", "m_b")
    assert(Reshape.unpivotToLong(emptyW, Seq("id"), Seq("m_a", "m_b")).count() == 0)
  }

  test("sampling plans are scan-side only: no Exchange, no Window (SCALE.md claim)") {
    val split = Sampling.hashSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.5))
    val sampled = Sampling.stratifiedHashSample(ids.withColumn("s", lit("x")),
      "id", "s", Map.empty, 0.3)
    for (df <- Seq(split, sampled)) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange") && !plan.contains("Window"))
    }
  }

  test("stratified sample is a subset: membership never flips across invocations") {
    val once = Sampling.stratifiedHashSample(ids.withColumn("s", lit("x")),
      "id", "s", Map.empty, 0.3).select("id").as[Long].collect().toSet
    val again = Sampling.stratifiedHashSample(ids.withColumn("s", lit("x")),
      "id", "s", Map.empty, 0.3).select("id").as[Long].collect().toSet
    assert(once == again && once.nonEmpty && once.size < 2000)
  }
}
