package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SimHash fingerprint of a token set in ONE per-row pass.
  *
  * Bit b (1-indexed, b ≤ 32) is derived from the b-th lowercase-hex digit
  * of md5(token): the digit's parity (odd → +1, even → −1) is summed over
  * the token set and the fingerprint bit is '1' iff the sum is positive —
  * the same engine-reproducible derivation as the SQL formulation
  * (`substr(md5(tok), b, 1) IN ('1','3',…,'f')`), so DuckDB computes the
  * identical string. Bits 33..63 extend the family with a SECOND digest,
  * md5(token ∥ '#'): digit b−32's parity, mirrored in SQL as
  * `substr(md5(tok || '#'), b - 32, 1)` — 63 is the ceiling so the
  * banded `conv(sig, 2, 10)` long stays sign-bit-clear on every engine
  * (the m6/binarySignature precedent).
  *
  * Replaces the token × bit explode plan (32× row amplification + two
  * shuffles on (doc_id, bit)): one digest per token, counters in a local
  * array, no shuffle — the fingerprint stage is scan-bound at any scale.
  * CodegenFallback is fine — one call per row amortizes over |tokens|
  * digests.
  */
case class SimHashSig(child: Expression, nBits: Int)
    extends UnaryExpression with CodegenFallback {
  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1, 63], got $nBits")

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_sig"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = MessageDigest.getInstance("MD5")
    val sums = new Array[Int](nBits)
    var i = 0
    var tokens = 0
    while (i < n) {
      // SQL callers can pass arrays with null elements (graft's own
      // shingleSets never does): skip them instead of NPE-ing
      if (!arr.isNullAt(i)) {
        tokens += 1
        val bytes = arr.getUTF8String(i).getBytes
        md.reset()
        md.update(bytes)
        val d = md.digest()
        val d2 = if (nBits <= 32) null else {
          md.reset(); md.update(bytes); md.update('#'.toByte); md.digest()
        }
        var b = 0
        while (b < nBits) {
          // hex digit b+1 of the md5 string: high nibble of byte b/2 when b
          // is even, low nibble when odd; digit parity == nibble low bit.
          // Bits 32.. read digits 1.. of the second digest.
          val (dig, p) = if (b < 32) (d, b) else (d2, b - 32)
          val nibble = if ((p & 1) == 0) (dig(p >> 1) >> 4) & 0xf else dig(p >> 1) & 0xf
          sums(b) += (if ((nibble & 1) == 1) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    if (tokens == 0) return null // no (non-null) tokens -> no fingerprint
    val out = new Array[Byte](nBits)
    var b = 0
    while (b < nBits) {
      out(b) = if (sums(b) > 0) '1' else '0'
      b += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  def apply(tokens: Column, nBits: Int): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(tokens), nBits))
}
