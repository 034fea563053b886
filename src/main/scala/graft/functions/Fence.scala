package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Optimizer fence: semantically the identity on `child`, but reported
  * as non-deterministic so Catalyst gives the column EVALUATE-ONCE
  * placement. Two rules otherwise multiply expensive expressions:
  *
  *  - `PushDownPredicates` copies a downstream filter below the
  *    projection that computes the column, inlining the full expression
  *    into the predicate (it then runs once in the filter and again in
  *    the projection);
  *  - `InferFiltersFromGenerate` + pushdown can inline it several more
  *    times (e.g. an error-header array referencing the capture struct
  *    three times put FIVE `try_capture` evaluations — five thrown
  *    exceptions and stack-trace renders per error row — into one scan).
  *
  * Both rules skip non-deterministic projections, which is exactly the
  * contract error capture wants: throwing and rendering a Java exception
  * is ~10^4× the cost of reading the resulting struct field, so the
  * capture must be computed once and referenced as an attribute. The
  * trade-off (filters on OTHER columns also stop migrating below the
  * capture projection) is deliberate — capture is applied after source
  * filters, and ErrorFrame's own branch filters can never reach the scan
  * anyway because they read the computed struct.
  */
case class Fence(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "fence"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Fence =
    copy(child = newChild)
}

object Fence {
  def apply(c: Column): Column = ColumnBridge.column(Fence(ColumnBridge.expression(c)))
}
