package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's custom expressions, both as
  * a `SparkSessionExtensions` injector (config
  * `spark.sql.extensions=graft.functions.GraftExtensions`) and as a
  * runtime `register(spark)` call for already-running sessions. After
  * either, `spark.sql("SELECT graft_dot(a, b)")` resolves to the
  * codegen'd [[VectorExpressions.DotProduct]].
  */
object GraftFunctions {

  private val dotInfo = new ExpressionInfo(
    VectorExpressions.DotProduct.getClass.getCanonicalName, null, "graft_dot",
    "graft_dot(a, b) - dot product of two numeric arrays in double precision.",
    "")

  private def dotBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2, s"graft_dot expects 2 arguments, got ${children.length}")
    VectorExpressions.DotProduct(children.head, children(1))
  }

  private val topkInfo = new ExpressionInfo(
    TopKAggregate.TopKByScore.getClass.getCanonicalName, null, "graft_topk",
    "graft_topk(score, id, k) - top-k (id, score) pairs by score, ties to smaller id.",
    "")

  private def topkBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 3, s"graft_topk expects 3 arguments, got ${children.length}")
    val k = children(2) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) => v.intValue()
      case other => throw new IllegalArgumentException(
        s"graft_topk k must be an integer literal, got $other")
    }
    TopKAggregate.TopKByScore(children.head, children(1), k)
  }

  private val countInSetInfo = new ExpressionInfo(
    TextExpressions.CountInSet.getClass.getCanonicalName, null, "graft_count_in_set",
    "graft_count_in_set(arr, w1, w2, ...) - count of arr elements among the literal words.",
    "")

  private def countInSetBuilder(children: Seq[Expression]): Expression = {
    require(children.length >= 2,
      s"graft_count_in_set expects an array plus at least one word, got ${children.length}")
    val words = children.tail.map {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
        v.toString
      case other => throw new IllegalArgumentException(
        s"graft_count_in_set words must be string literals, got $other")
    }
    TextExpressions.CountInSet(children.head, words)
  }

  private val shinglesInfo = new ExpressionInfo(
    TextExpressions.WordShingles.getClass.getCanonicalName, null, "graft_word_shingles",
    "graft_word_shingles(toks, n) - distinct word n-gram shingles, first-occurrence order.",
    "")

  private def shinglesBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"graft_word_shingles expects 2 arguments, got ${children.length}")
    val n = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) => v.intValue()
      case other => throw new IllegalArgumentException(
        s"graft_word_shingles n must be an integer literal, got $other")
    }
    TextExpressions.WordShingles(children.head, n)
  }

  private val textStatsInfo = new ExpressionInfo(
    TextExpressions.TextStats.getClass.getCanonicalName, null, "graft_text_stats",
    "graft_text_stats(text) - single-pass struct(n_tokens, n_chars, n_alpha, " +
      "hits_<i> per built-in stopword list).",
    "")

  private def textStatsBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 1, s"graft_text_stats expects 1 argument, got ${children.length}")
    TextExpressions.TextStats(children.head, graft.text.TextAnalysis.StopwordLists.map(_._2))
  }

  private val ngramStatsInfo = new ExpressionInfo(
    TextExpressions.NgramStats.getClass.getCanonicalName, null, "graft_ngram_stats",
    "graft_ngram_stats(toks, n) - struct(total, n_distinct, max_count) over word n-grams.",
    "")

  private def ngramStatsBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2, s"graft_ngram_stats expects 2 arguments, got ${children.length}")
    val n = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) => v.intValue()
      case other => throw new IllegalArgumentException(
        s"graft_ngram_stats n must be an integer literal, got $other")
    }
    TextExpressions.NgramStats(children.head, n)
  }

  private val quantizeInfo = new ExpressionInfo(
    VectorExpressions.Int8Quantize.getClass.getCanonicalName, null, "graft_int8_quantize",
    "graft_int8_quantize(vec) - struct(scale, q): symmetric int8 quantization codes.",
    "")

  private def quantizeBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 1,
      s"graft_int8_quantize expects 1 argument, got ${children.length}")
    VectorExpressions.Int8Quantize(children.head)
  }

  private val misraGriesInfo = new ExpressionInfo(
    HeavyHittersAggregate.getClass.getCanonicalName, null, "graft_misra_gries",
    "graft_misra_gries(item[, weight], k) - Misra-Gries heavy-hitter sketch: " +
      "<= k (item, est) counters, est desc then item asc.",
    "")

  private def misraGriesBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2 || children.length == 3,
      s"graft_misra_gries expects (item[, weight], k), got ${children.length} arguments")
    val k = children.last match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) => v.intValue()
      case other => throw new IllegalArgumentException(
        s"graft_misra_gries k must be an integer literal, got $other")
    }
    val weight =
      if (children.length == 3) children(1)
      else org.apache.spark.sql.catalyst.expressions.Literal(1L)
    HeavyHittersAggregate.MisraGries(children.head, weight, k)
  }

  private val vecMeanInfo = new ExpressionInfo(
    VectorAggregates.getClass.getCanonicalName, null, "graft_vec_mean",
    "graft_vec_mean(vec) - per-position mean of the group's numeric arrays " +
      "(embedding pooling); map-side partial (sum, n) state.",
    "")

  private def vecMeanBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 1,
      s"graft_vec_mean expects 1 argument, got ${children.length}")
    VectorAggregates.VecMean(children.head)
  }

  private val unicodeNormInfo = new ExpressionInfo(
    TextExpressions.getClass.getCanonicalName, null, "graft_unicode_normalize",
    "graft_unicode_normalize(text[, form]) - Unicode normalization " +
      "(NFC default; NFD/NFKC/NFKD literal).",
    "")

  private def unicodeNormBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 1 || children.length == 2,
      s"graft_unicode_normalize expects (text[, form]), got ${children.length} arguments")
    val form = if (children.length == 2) children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
        v.toString
      case other => throw new IllegalArgumentException(
        s"graft_unicode_normalize form must be a string literal, got $other")
    } else "NFC"
    TextExpressions.UnicodeNormalize(children.head, form)
  }

  private val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", dotInfo, dotBuilder),
    ("graft_topk", topkInfo, topkBuilder),
    ("graft_count_in_set", countInSetInfo, countInSetBuilder),
    ("graft_word_shingles", shinglesInfo, shinglesBuilder),
    ("graft_text_stats", textStatsInfo, textStatsBuilder),
    ("graft_ngram_stats", ngramStatsInfo, ngramStatsBuilder),
    ("graft_int8_quantize", quantizeInfo, quantizeBuilder),
    ("graft_misra_gries", misraGriesInfo, misraGriesBuilder),
    ("graft_vec_mean", vecMeanInfo, vecMeanBuilder),
    ("graft_unicode_normalize", unicodeNormInfo, unicodeNormBuilder))

  /** Inject into an extensions hook (builder-time path). */
  def inject(extensions: SparkSessionExtensions): Unit = {
    all.foreach { case (name, info, builder) =>
      extensions.injectFunction((FunctionIdentifier(name), info, builder))
    }
    extensions.injectOptimizerRule(_ => RewriteCountInSet)
  }

  /** Register on a live session (runtime path). */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftShims.registerFunction(spark, name, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(RewriteCountInSet))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteCountInSet
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftFunctions.inject(extensions)
}
