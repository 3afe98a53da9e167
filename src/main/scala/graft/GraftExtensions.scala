package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DotProductLong, Md5Hash60}

/** Session extension entry point (`spark.sql.extensions=graft.GraftExtensions`)
  * — registers the engine's native expressions into the function registry at
  * session build time, so SQL users on a cluster get `dot_long(a, b)` /
  * `md5_hash60(s)` without touching the Scala API. For an already-built
  * session (tests, notebooks) use [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotLongDescriptor)
    ext.injectFunction(GraftExtensions.md5Hash60Descriptor)
  }
}

object GraftExtensions {

  private def info(clazz: Class[_], name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  val dotLongDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("dot_long"),
      info(classOf[DotProductLong], "dot_long", "dot_long(a, b) - exact integer dot product of two BIGINT arrays"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"dot_long requires exactly 2 arguments, got ${children.length}")
        DotProductLong(children.head, children(1))
      })

  val md5Hash60Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("md5_hash60"),
      info(classOf[Md5Hash60], "md5_hash60", "md5_hash60(s) - top 60 bits of md5(s) as BIGINT"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new IllegalArgumentException(
            s"md5_hash60 requires exactly 1 argument, got ${children.length}")
        Md5Hash60(children.head)
      })

  /** Register into an existing session (plus the §2.10 SQL scalar names). */
  def register(spark: SparkSession): Unit = {
    Seq(dotLongDescriptor, md5Hash60Descriptor).foreach { case (ident, einfo, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, einfo, builder)
    }
    graft.functions.Udfs.register(spark)
  }
}
