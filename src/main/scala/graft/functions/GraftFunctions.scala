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

  /** Inject into an extensions hook (builder-time path). */
  def inject(extensions: SparkSessionExtensions): Unit =
    extensions.injectFunction((FunctionIdentifier("graft_dot"), dotInfo, dotBuilder))

  /** Register on a live session (runtime path). */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.GraftShims.registerFunction(spark, "graft_dot", dotBuilder)
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftFunctions.inject(extensions)
}
