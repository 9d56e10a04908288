package graft.functions

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("countInSet: counts duplicates, skips null elements, null array -> null") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq("the", "cat", "the", "dog")),
      (2L, Seq.empty[String])).toDF("id", "toks")
      .union(Seq((3L, null.asInstanceOf[Seq[String]])).toDF("id", "toks"))
    val got = df.select(col("id"),
        TextExpressions.countInSet(col("toks"), Seq("the", "a")).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(got == Map(1L -> 2, 2L -> 0, 3L -> -1))
    // Interpreted path must agree with codegen (filter pushes it there).
    val interp = df.where(TextExpressions.countInSet(col("toks"), Seq("the")) > 0)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(interp == Seq(1L))
  }

  test("WordShingles == the built-in HOF form on every input shape") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df = Seq(
      Seq("a", "b", "c", "d"),
      Seq("a", "b", "a", "b", "a", "b"), // duplicate shingles -> distinct, first-occurrence order
      Seq("a", "b"),                     // fewer than n tokens -> empty
      Seq("solo"),
      Seq.empty[String]).toDF("toks")
    val n = 3
    val builtin = array_distinct(transform(sequence(lit(1), size(col("toks")) - (n - 1)),
      i => concat_ws(" ", slice(col("toks"), i, lit(n)))))
    val builtinSafe = when(size(col("toks")) >= n, builtin)
      .otherwise(array().cast(ArrayType(StringType)))
    val rows = df.select(
      TextExpressions.wordShingles(col("toks"), n).as("custom"),
      builtinSafe.as("ref")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
  }

  test("TextStats == the composed split/probe/regex form on every input shape") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import graft.text.TextAnalysis
    val texts = Seq(
      "the quick brown fox and the dog",
      "der und die das",               // de stopwords
      "\tstarts with a tab",           // leading \t survives space-trim -> leading empty token
      "trailing tab\t",                // trailing \t -> trailing empty token (split limit -1)
      "   ",                           // all spaces -> zero tokens
      "\t\n",                          // only non-space whitespace -> one empty token
      "The THE the",                   // case-sensitive hits
      "mixed  \t spacing\r\nhere",
      "数字 und unicode ün",            // multi-byte chars
      "")
    val df = texts.toDF("text")
      .union(Seq(null.asInstanceOf[String]).toDF("text"))
    // Composed reference implementations (the pre-TextStats forms).
    val toks = when(trim(col("text")) === "", array().cast(ArrayType(StringType)))
      .otherwise(split(trim(col("text")), "\\s+"))
    val refTokens = size(toks)
    val refAlpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
    val rows = df.select(
      TextAnalysis.textStats(col("text")).as("st"),
      refTokens.as("ref_tokens"), length(col("text")).as("ref_chars"),
      refAlpha.as("ref_alpha"),
      TextExpressions.countInSet(toks, TextAnalysis.StopwordLists.head._2).as("ref_en"),
      TextExpressions.countInSet(toks, TextAnalysis.StopwordLists(1)._2).as("ref_de"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1) && r.isNullAt(2))
      else {
        val st = r.getStruct(0)
        assert(st.getInt(0) == r.getInt(1), s"n_tokens: $r")
        assert(st.getInt(1) == r.getInt(2), s"n_chars: $r")
        assert(st.getInt(2) == r.getInt(3), s"n_alpha: $r")
        assert(st.getInt(3) == r.getInt(4), s"hits_en: $r")
        assert(st.getInt(4) == r.getInt(5), s"hits_de: $r")
      }
    }
    // Interpreted path (filter) agrees with the projected/codegen path.
    val viaFilter = df.where(TextAnalysis.textStats(col("text")).getField("n_tokens") > 3)
      .count()
    val viaProject = rows.count(r => !r.isNullAt(1) && r.getInt(1) > 3)
    assert(viaFilter == viaProject)
  }

  test("NgramStats == explode/groupBy reference on every input shape") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      Seq("a", "b", "a", "b", "a"),     // bigrams: "a b" x2, "b a" x2
      Seq("x", "x", "x", "x"),          // "x x" x3
      Seq("solo"),                      // no bigrams
      Seq.empty[String]).toDF("toks")
      .union(Seq(null.asInstanceOf[Seq[String]]).toDF("toks"))
    val rows = df.select(TextExpressions.ngramStats(col("toks"), 2).as("st"),
        col("toks")).collect()
    rows.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0))
      else {
        val toks = r.getSeq[String](1)
        val grams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).view.mapValues(_.size)
        val st = r.getStruct(0)
        assert(st.getInt(0) == grams.size, s"total: $toks")
        assert(st.getInt(1) == counts.size, s"distinct: $toks")
        assert(st.getInt(2) == (if (grams.isEmpty) 0 else counts.values.max), s"max: $toks")
      }
    }
  }

  test("Int8Quantize: saturation at ±127, zero/empty vectors, null element") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      Seq(1.0f, -2.0f, 0.5f),
      Seq(0.0f, 0.0f),
      Seq.empty[Float]).toDF("v")
    val rows = df.select(VectorExpressions.int8Quantize(col("v")).as("q")).collect()
    val s0 = rows(0).getStruct(0)
    assert(s0.getDouble(0) == 127.0 / 2.0)
    assert(s0.getSeq[Int](1) == Seq(64, -127, 32)) // floor(x*63.5+0.5)
    val s1 = rows(1).getStruct(0)
    assert(s1.getDouble(0) == 0.0 && s1.getSeq[Int](1) == Seq(0, 0))
    val s2 = rows(2).getStruct(0)
    assert(s2.getDouble(0) == 0.0 && s2.getSeq[Int](1).isEmpty)
    // Null element -> null result, on both the codegen and eval paths.
    val withNull = Seq(Seq[java.lang.Float](1.0f, null)).toDF("v")
    assert(withNull.select(VectorExpressions.int8Quantize(col("v"))).collect().head.isNullAt(0))
    val filtered = withNull.where(VectorExpressions.int8Quantize(col("v")).isNull)
    assert(filtered.count() == 1)
  }

  test("RewriteCountInSet: size(filter(toks, IN-literals)) becomes the kernel, same results") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    // range-based input: a local Seq would be collapsed whole by
    // ConvertToLocalRelation and leave no expressions to inspect.
    val df = spark.range(1, 5).select(col("id"),
      when(col("id") === 1, array(lit("the"), lit("cat"), lit("the")))
        .when(col("id") === 2, array(lit("dog")))
        .when(col("id") === 3, array().cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))
        .as("toks")) // id 4 -> null array
    val hof = df.select(col("id"),
      size(filter(col("toks"), t => t.isin("the", "a"))).as("c"))
    // The optimized plan must carry the kernel, not the HOF chain...
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_count_in_set"), optimized)
    // ...and agree with the unrewritten semantics (null array -> null,
    // null elements skipped) computed via the direct kernel call.
    val direct = df.select(col("id"),
      TextExpressions.countInSet(col("toks"), Seq("the", "a")).as("c"))
    assert(hof.collect().map(_.toString).toSeq ==
      direct.collect().map(_.toString).toSeq)
    // SQL surface too (IN list may become InSet under OptimizeIn).
    df.createOrReplaceTempView("rw_v")
    val sqlForm = spark.sql(
      "SELECT id, size(filter(toks, t -> t IN ('the', 'a'))) AS c FROM rw_v")
    assert(sqlForm.queryExecution.optimizedPlan.toString.contains("graft_count_in_set"))
    assert(sqlForm.collect().map(_.toString).toSeq ==
      direct.collect().map(_.toString).toSeq)
  }

  test("non-nullable inputs stay on the codegen path (no Janino fallback)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // A column-derived array with literal padding is non-nullable with
    // containsNull=false (and not constant-foldable): the generated code
    // must not reference the unassignable isNull slot (the pre-fix code
    // emitted `false = true`, failed Janino compilation, and silently
    // demoted the whole stage to interpreted).
    val arr = array(col("x").cast("double"), lit(4.0))
    val df = Seq(3).toDF("x")
      .select(VectorExpressions.dotFast(arr, arr).as("d"),
        VectorExpressions.int8Quantize(arr).as("q"))
    assert(!df.schema("d").nullable && !df.schema("q").nullable,
      "test premise: the non-nullable codegen branch must be exercised")
    // With fallback disabled, a codegen compilation failure THROWS
    // instead of silently running interpreted.
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val row = df.collect().head
      assert(row.getDouble(0) == 25.0)
      assert(row.getStruct(1).getSeq[Int](1) == Seq(95, 127)) // floor(x*31.75+0.5)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("graft_count_in_set resolves in SQL; words must be literals") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_count_in_set(array('a', 'b', 'a', 'c'), 'a', 'c') AS n")
      .collect().head.getInt(0)
    assert(got == 3)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_count_in_set(array('a'), upper('a')) AS n").collect()
    }
    assert(err.getMessage.contains("string literals") ||
      Option(err.getCause).exists(_.getMessage.contains("string literals")))
  }

  test("graft_dot resolves in SQL after runtime registration") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(got == 32.0)
  }

  test("graft_dot: null element and float arrays") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT graft_dot(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS f,
        |       graft_dot(array(1.0D, NULL), array(1.0D, 1.0D)) AS n""".stripMargin)
      .collect().head
    assert(rows.getDouble(0) == 3.0)
    assert(rows.isNullAt(1))
  }

  test("graft_topk aggregate resolves in SQL") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      """SELECT g, graft_topk(s, id, 2) AS tk
        |FROM VALUES (1, 5.0D, 10L), (1, 7.0D, 3L), (1, 1.0D, 1L), (2, 2.0D, 2L) AS t(g, s, id)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    val g1 = got(0).getSeq[org.apache.spark.sql.Row](1).map(p => (p.getLong(0), p.getDouble(1)))
    assert(g1 == Seq((3L, 7.0), (10L, 5.0)))
  }

  test("extensions class injects the function builder") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builder wiring smoke
  }

  test("graft_dot rejects non-array inputs at analysis") {
    GraftFunctions.register(spark)
    val e = intercept[Exception](spark.sql("SELECT graft_dot(1, 2)").collect())
    assert(e.getMessage.toLowerCase.contains("dot") ||
      e.getMessage.toLowerCase.contains("type"))
  }

  test("UnicodeNormalize: NFC merges composed/decomposed; NFKC folds compatibility forms") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val composed = "café"         // U+00E9
    val decomposed = "café"      // e + U+0301
    val df = Seq(Some(composed), Some(decomposed), None).toDF("s")
    val nfc = df.select(TextExpressions.unicodeNormalize(col("s")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(nfc(0) == Some(composed) && nfc(1) == Some(composed)) // both collapse to NFC
    assert(nfc(2).isEmpty)                                       // null passes through
    // NFKC folds compatibility characters NFC leaves alone (ﬁ ligature).
    val nfkc = Seq("ﬁle").toDF("s")
      .select(TextExpressions.unicodeNormalize(col("s"), "NFKC").as("n"))
      .head().getString(0)
    assert(nfkc == "file")
    intercept[IllegalArgumentException](
      TextExpressions.unicodeNormalize(col("s"), "NFX"))
    // SQL surface, default and explicit form.
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("nfc_probe")
    val viaSql = spark.sql(
      "SELECT graft_unicode_normalize(s) FROM nfc_probe WHERE s IS NOT NULL")
      .collect().map(_.getString(0)).toSet
    assert(viaSql == Set(composed))
    val nfd = spark.sql(
      s"SELECT graft_unicode_normalize('$composed', 'NFD')").head().getString(0)
    assert(nfd == decomposed)
  }
}
