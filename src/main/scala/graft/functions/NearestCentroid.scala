package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Nearest-centroid argmin as a pure per-row expression over a
  * driver-embedded centroid set — the MLlib broadcast-centroids pattern:
  * k-means assignment needs NO shuffle, no window sort and no aggregate
  * at all; the scan is the whole job. Embedding the k centroids in the
  * expression is the same bounded-small-side reasoning as a broadcast
  * join (k × dim doubles, kilobytes for any sane coarse quantizer).
  *
  * Arithmetic parity: dist² = ‖v‖² + ‖c‖² − 2·v·c with every term a
  * sequential left fold in element order (the [[VectorDot]] contract), so
  * values are bit-identical to the crossJoin formulation and to DuckDB's
  * `list_reduce`. Ties break on (dist², cid): centroids are scanned in
  * ascending-cid order with strict-less updates.
  *
  * Returns `struct<cluster_id: bigint, dist2: double>`; null input → null.
  * CodegenFallback: one virtual call per row amortizes the k × dim loop.
  */
case class NearestCentroid(child: Expression, cids: Seq[Long], cents: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {
  require(cids.nonEmpty && cids.length == cents.length,
    s"need >= 1 centroid and one id per centroid: ${cids.length} ids, ${cents.length} vectors")
  require(cids.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
    "centroid ids must be strictly ascending (tie-break contract)")

  override def dataType: DataType = StructType(Seq(
    StructField("cluster_id", LongType, nullable = false),
    StructField("dist2", DoubleType, nullable = false)))
  override def prettyName: String = "nearest_centroid"

  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val centArr: Array[Array[Double]] = cents.map(_.toArray).toArray
  // ‖c‖² as the same left fold DuckDB's list_reduce performs
  @transient private lazy val ccArr: Array[Double] = centArr.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = arr.getDouble(i); i += 1 }
    var vv = 0.0
    i = 0
    while (i < n) { vv += v(i) * v(i); i += 1 }
    var bestCid = cidArr(0)
    var bestDist = Double.PositiveInfinity
    var k = 0
    while (k < cidArr.length) {
      val c = centArr(k)
      var dot = 0.0
      var j = 0
      val m = math.min(n, c.length)
      while (j < m) { dot += v(j) * c(j); j += 1 }
      val d = vv + ccArr(k) - 2.0 * dot
      if (d < bestDist) { bestDist = d; bestCid = cidArr(k) }
      k += 1
    }
    new GenericInternalRow(Array[Any](bestCid, bestDist)): InternalRow
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  def apply(vec: Column, cids: Seq[Long], cents: Seq[Seq[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(vec), cids, cents))
}
