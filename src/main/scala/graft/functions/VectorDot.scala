package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Dot product of two `array<double>` columns as a codegen'd tight loop.
  *
  * Replaces the `aggregate(zip_with(a, b, _*_), 0.0, _+_)` higher-order
  * formulation (interpreted per element) with generated Java — same
  * left-to-right IEEE accumulation, so results are bit-identical to the
  * sequential fold, at loop speed. Null if either side is null; length =
  * min(|a|, |b|).
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double ${ev.value}Acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          ${ev.value}Acc += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = ${ev.value}Acc;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
