package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Full MinHash signature of a shingle set in ONE per-row pass.
  *
  * For each seed s in [0, numHashes): min over shingles of the md5 hex of
  * "s:shingle" — exactly the value of the exploded
  * `min(md5(concat(s, ':', tok)))` formulation (hex lexicographic order ==
  * unsigned byte order of the raw digest), but with no token explode and
  * no (doc, seed) shuffle: at scale the signature stage becomes
  * scan-bound. CodegenFallback is fine here — one call per row amortizes
  * over |shingles| × numHashes digests.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null // no shingles -> no signature (as in the exploded form)
    val md = MessageDigest.getInstance("MD5")
    val mins = Array.fill[Array[Byte]](numHashes)(null)
    var s = 0
    while (s < numHashes) {
      val prefix = (s.toString + ":").getBytes(StandardCharsets.UTF_8)
      var i = 0
      var min: Array[Byte] = null
      while (i < n) {
        md.reset()
        md.update(prefix)
        md.update(arr.getUTF8String(i).getBytes)
        val d = md.digest()
        if (min == null || compareUnsigned(d, min) < 0) min = d
        i += 1
      }
      mins(s) = min
      s += 1
    }
    new GenericArrayData(mins.map(d => UTF8String.fromString(toHex(d)): Any))
  }

  private def compareUnsigned(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    0
  }

  private def toHex(d: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numHashes))
}
