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
}
