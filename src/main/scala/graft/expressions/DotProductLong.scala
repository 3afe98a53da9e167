package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two BIGINT arrays as a native Catalyst
  * expression WITH code generation — the hot kernel of the similarity /
  * embedding-dedup operators (SURVEY.md §2.11 E1e/E2).
  *
  * Why a custom `Expression` (the §7.3 ladder): the built-in spelling
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)`
  * allocates an intermediate array and runs interpreted lambda calls per
  * element — per ROW, inside joins that evaluate it per candidate PAIR. This
  * expression compiles to a tight primitive loop inside whole-stage codegen
  * (no allocation, no virtual calls), with an identical interpreted `eval`
  * for non-codegen paths. Semantics match the built-in spelling exactly:
  * null if either input is null, if the lengths differ (zip_with would pad
  * with nulls), or if any element is null.
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "dot_long"

  // Null semantics mirror the built-in spelling exactly: a null INPUT array
  // returns null (BinaryExpression default); a length mismatch or any null
  // ELEMENT also returns null (zip_with pads with nulls / multiplies to
  // null, and aggregate's sum then stays null).
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |long $acc = 0L;
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getLong($i) * $y.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

object DotProductLong {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-DSL entry point: `dotLong(a, b)`. */
  def dotLong(a: Column, b: Column): Column =
    Bridge.column(DotProductLong(Bridge.expression(a), Bridge.expression(b)))
}
