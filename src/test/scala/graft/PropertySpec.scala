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

  test("TextStats agrees with the composed split/regex/probe form on random text") {
    import graft.text.TextAnalysis
    import org.apache.spark.sql.types._
    // Strings over a hostile alphabet: whitespace variants, multi-byte
    // chars, stopwords, digits, punctuation.
    val alphabet = Seq(" ", "\t", "\n", "\r", "\f", "", "the", "und", "der",
      "a", "Z", "0", "9", "é", "中", ".", "$")
    val texts = (0 until 300).flatMap { _ =>
      Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf(alphabet)))
        .map(_.mkString("")).sample
    }
    val df = texts.toDF("text")
    val toks = when(trim(col("text")) === "", array().cast(ArrayType(StringType)))
      .otherwise(split(trim(col("text")), "\\s+"))
    val rows = df.select(
      TextAnalysis.textStats(col("text")).as("st"),
      size(toks).as("ref_tokens"),
      length(col("text")).as("ref_chars"),
      length(regexp_replace(col("text"), "[^A-Za-z]", "")).as("ref_alpha"),
      graft.functions.TextExpressions.countInSet(toks,
        TextAnalysis.StopwordLists.head._2).as("ref_en")).collect()
    rows.foreach { r =>
      val st = r.getStruct(0)
      assert(st.getInt(0) == r.getInt(1), s"n_tokens: ${r}")
      assert(st.getInt(1) == r.getInt(2), s"n_chars: ${r}")
      assert(st.getInt(2) == r.getInt(3), s"n_alpha: ${r}")
      assert(st.getInt(3) == r.getInt(4), s"hits_en: ${r}")
    }
  }

  test("NgramStats invariants on random token arrays") {
    val arrays = (0 until 300).flatMap { _ =>
      Gen.chooseNum(0, 20).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", ""))).sample
    }
    for (n <- Seq(1, 2, 3)) {
      val rows = arrays.toDF("toks")
        .select(col("toks"), graft.functions.TextExpressions.ngramStats(col("toks"), n).as("st"))
        .collect()
      rows.foreach { r =>
        val toks = r.getSeq[String](0)
        val st = r.getStruct(1)
        val (total, distinct, maxc) = (st.getInt(0), st.getInt(1), st.getInt(2))
        val grams = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
        assert(total == grams.size)
        assert(distinct == grams.distinct.size)
        assert(maxc == (if (grams.isEmpty) 0
          else grams.groupBy(identity).values.map(_.size).max))
        assert(distinct <= total && maxc <= total)
        assert((total == 0) == (maxc == 0))
      }
    }
  }

  test("Int8Quantize round trip: dequantized codes within half a step of the input") {
    import graft.functions.VectorExpressions
    val vecs = (0 until 200).flatMap { _ =>
      Gen.chooseNum(1, 16).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-1000.0, 1000.0))).sample
    }.map(_.map(_.toFloat))
    val rows = vecs.toDF("v")
      .select(col("v"), VectorExpressions.int8Quantize(col("v")).as("q"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val st = r.getStruct(1)
      val (scale, q) = (st.getDouble(0), st.getSeq[Int](1))
      assert(q.forall(c => c >= -127 && c <= 127), s"saturation: $q")
      if (scale > 0) v.zip(q).foreach { case (x, c) =>
        // |x - c/scale| <= 0.5/scale (floor(x*scale+0.5) is nearest-code)
        assert(math.abs(x.toDouble - c / scale) <= 0.5 / scale + 1e-9,
          s"x=$x c=$c scale=$scale")
      }
    }
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
