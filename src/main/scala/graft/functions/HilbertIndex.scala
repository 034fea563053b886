package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** n-D Hilbert curve index of `n` long coordinates, each masked to
  * `bits` bits (same aliasing-never-overflow contract as the Morton
  * layouts; output occupies `n*bits ≤ 63` bits).
  *
  * Why beside z-order: Morton's bit interleave takes long diagonal jumps
  * between quadrants, so a file covering a contiguous Morton range can
  * span two far-apart rectangles; the Hilbert curve is a UNIT-STEP
  * Hamiltonian path over the grid (consecutive indices are L1-distance-1
  * neighbors — HilbertSpec proves this exhaustively), so a contiguous
  * index range is one connected blob and per-file min/max boxes are
  * tighter on every dimension. This is the curve behind Delta's liquid
  * clustering; here it is Skilling's transpose algorithm ("Programming
  * the Hilbert curve", AIP Conf. Proc. 707, 2004 — public domain) as a
  * native expression whose generated code is one static call per row.
  */
case class HilbertIndex(children: Seq[Expression], bits: Int) extends Expression {
  require(children.size >= 2 && children.size <= 8,
    s"hilbert_index needs 2..8 columns: ${children.size}")
  require(bits >= 1 && bits * children.size <= 63,
    s"bits*cols must fit 63: $bits*${children.size}")

  // LONG enforced at analysis time — children are unresolved at construction
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "hilbert_index children must be LONG (cast upstream)")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "hilbert_index"

  override def eval(input: InternalRow): Any = {
    val coords = new Array[Long](children.size)
    var i = 0
    while (i < coords.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      coords(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertIndex.index(coords, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("hcoords")
    val childCode = evals.map(_.code).mkString("\n")
    val anyNull =
      if (nullable) evals.map(_.isNull.toString).mkString(" || ") else "false"
    val fills = evals.zipWithIndex
      .map { case (e, i) => s"$arr[$i] = ${e.value};" }.mkString("\n")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = -1L;
      if (!${ev.isNull}) {
        long[] $arr = new long[${children.size}];
        $fills
        ${ev.value} = graft.functions.HilbertIndex.index($arr, $bits);
      }
    """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HilbertIndex =
    copy(children = newChildren)
}

object HilbertIndex {
  def apply(cols: Seq[Column], bits: Int): Column =
    ColumnBridge.column(HilbertIndex(cols.map(ColumnBridge.expression), bits))

  /** Axes → Hilbert index (Skilling 2004, transpose form). Masks each
    * coordinate to `bits`; pure 64-bit integer ops, engine-reproducible.
    * Called from generated code — keep the signature JVM-primitive.
    */
  def index(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    val x = new Array[Long](n)
    val mask = (1L << bits) - 1
    var i = 0
    while (i < n) { x(i) = coords(i) & mask; i += 1 }
    // inverse undo of the excess rotations (walk bits high → low)
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p // invert low bits of axis 0
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t } // exchange
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave the transposed bits: bit j of axis i → output bit
    // (j*n + (n-1-i)) — axis 0 most significant within each group
    var out = 0L
    var j = bits - 1
    while (j >= 0) {
      i = 0
      while (i < n) { out = (out << 1) | ((x(i) >>> j) & 1L); i += 1 }
      j -= 1
    }
    out
  }
}
