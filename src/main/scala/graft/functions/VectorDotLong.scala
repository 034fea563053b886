package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Integer dot product of two `array<int>` columns as a codegen'd tight
  * loop returning LONG — [[VectorDot]]'s exact-integer twin for the SQ8
  * serving path (s17), whose coarse stage evaluates one int dot per
  * (query × vector) PAIR and was paying the interpreted
  * `aggregate(zip_with(...))` tax on every element (the q55/t32
  * measured HOF lesson). Sums of int×int products are exact in long
  * (dim · 127² ≪ 2⁶³), so the result is bit-identical to the
  * higher-order fold regardless of association; the loop keeps the
  * same left-to-right order anyway. Null if either side is null;
  * length = min(|a|, |b|).
  */
case class VectorDotLong(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "vector_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getInt(i).toLong * y.getInt(i).toLong
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
        long ${ev.value}Acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          ${ev.value}Acc += (long) $a.getInt($i) * (long) $b.getInt($i);
        }
        ${ev.value} = ${ev.value}Acc;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VectorDotLong =
    copy(left = newLeft, right = newRight)
}

object VectorDotLong {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDotLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
