package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.ops.Normalize

/** Property-based invariants (SURVEY.md §5 test plan item 2), using
  * ScalaCheck generators directly: each property evaluates a batch of
  * generated inputs through the actual Catalyst expressions (one local
  * job per property, not per sample).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("quarter label always matches ^\\d{4}-Q[1-4]$ and agrees with the month") {
    val dates = (0 until 200).flatMap(_ => Gen.choose(0L, 365L * 60).sample)
      .map(d => java.sql.Date.valueOf(java.time.LocalDate.of(1980, 1, 1).plusDays(d)))
    val rows = dates.toDF("d")
      .select(col("d"), Normalize.quarterLabel(col("d")).as("label"))
      .collect()
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate
      val label = r.getString(1)
      assert(label.matches("^\\d{4}-Q[1-4]$"), s"$d -> $label")
      val expectedQ = (d.getMonthValue - 1) / 3 + 1
      assert(label == s"${d.getYear}-Q$expectedQ", s"$d -> $label")
    }
  }

  test("safe decimal heuristic is idempotent for values >= 1e6") {
    val vals = (0 until 200).flatMap(_ =>
      Gen.choose(1000000.0, 9.99e11).sample).map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    val df = vals.map(_.toString).toDF("raw")
    val once = df.select(Normalize.safeDecimal(col("raw")).as("v"))
    val twice = once.select(Normalize.safeDecimal(col("v").cast("string")).as("v"))
    assert(once.collect().map(_.getDecimal(0)).toSeq ==
      twice.collect().map(_.getDecimal(0)).toSeq)
  }

  test("TopKBuffer: random inserts + merges agree with sort-based reference") {
    import graft.functions.TopKAggregate.TopKBuffer
    val rng = new scala.util.Random(42)
    for (_ <- 0 until 50) {
      val k = rng.nextInt(8) + 1
      val n = rng.nextInt(200)
      val pairs = (0 until n).map(_ => (rng.nextInt(20).toDouble, rng.nextLong(1000)))
      // split into two buffers, merge — mirrors partial aggregation
      val (p1, p2) = pairs.splitAt(pairs.length / 2)
      val b1 = new TopKBuffer(k); p1.foreach { case (s, i) => b1.insert(s, i) }
      val b2 = new TopKBuffer(k); p2.foreach { case (s, i) => b2.insert(s, i) }
      // merge b2 into b1 the way the aggregate does
      (0 until b2.size).foreach(i => b1.insert(b2.scores(i), b2.ids(i)))
      val got = b1.sortedPairs.toSeq
      val expected = pairs.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(got == expected, s"k=$k n=$n")
    }
  }

  test("parseDateMulti round-trips any date rendered in any supported format") {
    val fmts = Seq("yyyy-MM-dd", "yyyy-MM-dd HH:mm:ss", "MM/dd/yyyy")
    val dates = (0 until 100).flatMap(_ => Gen.choose(0L, 365L * 60).sample)
      .map(d => java.time.LocalDate.of(1980, 1, 1).plusDays(d))
    val inputs = dates.zipWithIndex.map { case (d, i) =>
      val f = fmts(i % fmts.size)
      val rendered = d.atStartOfDay.format(java.time.format.DateTimeFormatter.ofPattern(f))
      (rendered, java.sql.Date.valueOf(d))
    }
    val got = inputs.toDF("raw", "expected")
      .select(Normalize.parseDateMulti(col("raw")).as("parsed"), col("expected"))
      .collect()
    got.foreach(r => assert(r.getDate(0) == r.getDate(1)))
  }

  test("parseDateLabelPath: month-first wins when valid, day-first rescues it") {
    val rows = Seq(
      ("05/06/2020", "2020-05-06"),  // ambiguous -> month-first (reference try order)
      ("13/01/2020", "2020-01-13"),  // month 13 invalid -> day-first fallback
      ("29/02/2020", "2020-02-29"),  // leap day via day-first
      ("2020-07-04", "2020-07-04"),
      ("2020",       null)           // NO bare-year rule in the label path
    )
    val got = rows.toDF("raw", "expected")
      .select(Normalize.parseDateLabelPath(col("raw")).cast("string").as("p"), col("expected"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }
}
