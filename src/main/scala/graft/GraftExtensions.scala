package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.DotProductLong

/** Session extension entry point (`spark.sql.extensions=graft.GraftExtensions`)
  * — registers the engine's native expressions into the function registry at
  * session build time, so SQL users on a cluster get `dot_long(a, b)` without
  * touching the Scala API. For an already-built session (tests, notebooks)
  * use [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.dotLongDescriptor)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[DotProductLong].getName, null, name, usage, "")

  val dotLongDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("dot_long"),
      info("dot_long", "dot_long(a, b) - exact integer dot product of two BIGINT arrays"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"dot_long requires exactly 2 arguments, got ${children.length}")
        DotProductLong(children.head, children(1))
      })

  /** Register into an existing session (plus the §2.10 SQL scalar names). */
  def register(spark: SparkSession): Unit = {
    val (ident, einfo, builder) = dotLongDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, einfo, builder)
    graft.functions.Udfs.register(spark)
  }
}
