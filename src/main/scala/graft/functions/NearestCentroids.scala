package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Top-n nearest centroids per row — the multi-probe extension of
  * [[NearestCentroid]]: emits the `n` closest centroids ordered by
  * (dist², cluster_id) so IVF probing can fan one query out to several
  * inverted lists (nprobe > 1 lifts the recall ceiling of probing only
  * the owning cell). Same driver-embedded-centroids reasoning and the
  * same left-fold arithmetic contract as [[NearestCentroid]], so dist²
  * values are bit-identical to the SQL `n.vv + s.cc - 2*list_reduce(...)`
  * formulation and tie-breaks match `ORDER BY dist2, cid`.
  *
  * Returns `array<struct<cluster_id: bigint, dist2: double>>` of length
  * min(n, k); null input → null. Selection is n passes of argmin over
  * the k distances — k is a coarse-quantizer cell count (small), the
  * scan stays the whole job.
  */
case class NearestCentroids(child: Expression, cids: Seq[Long], cents: Seq[Seq[Double]],
    n: Int) extends UnaryExpression with CodegenFallback {
  require(cids.nonEmpty && cids.length == cents.length,
    s"need >= 1 centroid and one id per centroid: ${cids.length} ids, ${cents.length} vectors")
  require(cids.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
    "centroid ids must be strictly ascending (tie-break contract)")
  require(n >= 1, s"n must be >= 1: $n")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cluster_id", LongType, nullable = false),
    StructField("dist2", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "nearest_centroids"

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
    val len = arr.numElements()
    val v = new Array[Double](len)
    var i = 0
    while (i < len) { v(i) = arr.getDouble(i); i += 1 }
    var vv = 0.0
    i = 0
    while (i < len) { vv += v(i) * v(i); i += 1 }
    val k = cidArr.length
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = centArr(c)
      var dot = 0.0
      var j = 0
      val m = math.min(len, cent.length)
      while (j < m) { dot += v(j) * cent(j); j += 1 }
      dists(c) = vv + ccArr(c) - 2.0 * dot
      c += 1
    }
    // n passes of argmin with marking; ascending-cid scan with strict-less
    // updates keeps the (dist2, cid) tie-break
    val take = math.min(n, k)
    val taken = new Array[Boolean](k)
    val out = new Array[Any](take)
    var r = 0
    while (r < take) {
      var best = -1
      var bestDist = Double.PositiveInfinity
      var c2 = 0
      while (c2 < k) {
        if (!taken(c2) && dists(c2) < bestDist) { bestDist = dists(c2); best = c2 }
        c2 += 1
      }
      taken(best) = true
      out(r) = new GenericInternalRow(Array[Any](cidArr(best), dists(best))): InternalRow
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

object NearestCentroids {
  def apply(vec: Column, cids: Seq[Long], cents: Seq[Seq[Double]], n: Int): Column =
    ColumnBridge.column(NearestCentroids(ColumnBridge.expression(vec), cids, cents, n))
}
