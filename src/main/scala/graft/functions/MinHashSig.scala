package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Full MinHash signature of a shingle set in ONE per-row pass, using the
  * standard universal-hash family: each shingle is hashed ONCE (first 28
  * bits of its md5), then permuted per seed by `(a_s * h + b_s) mod p`
  * with p = 2^31 - 1 — 16× less digest work than seeded re-hashing, and
  * exactly reproducible in SQL engines (the 28-bit base hash is the
  * fold of the first 7 lowercase-hex md5 chars).
  *
  * No token explode, no (doc, seed) shuffle: the signature stage is
  * scan-bound at any scale. CodegenFallback is fine — one call per row
  * amortizes over |shingles| digests.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null // no shingles -> no signature
    val md = MessageDigest.getInstance("MD5")
    // base 28-bit hash per shingle (== fold of first 7 hex chars)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(arr.getUTF8String(i).getBytes)
      val d = md.digest()
      hs(i) = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >> 4)
      i += 1
    }
    val mins = new Array[Any](numHashes)
    var s = 0
    while (s < numHashes) {
      val a = MinHashSig.coeffA(s)
      val b = MinHashSig.coeffB(s)
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * hs(j) + b) % MinHashSig.P
        if (v < min) min = v
        j += 1
      }
      mins(s) = min
      s += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Mersenne prime 2^31 - 1; a*h stays well inside Long. */
  val P: Long = 2147483647L
  def coeffA(s: Int): Long = ((2L * s + 1L) * 2654435761L) % P
  def coeffB(s: Int): Long = s.toLong * 40503L + 1L

  def apply(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numHashes))
}
