package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed char-n-gram feature buckets of a string in ONE per-row pass —
  * the native replacement for the
  * `explode(transform(sequence(...), i -> substring(t, i, n)))` →
  * `md5` → dictionary-join pipeline in trained language ID: Spark
  * evaluates those lambdas interpreted (a closure call plus a substring
  * allocation per CHARACTER of the corpus), and every gram string then
  * rides an exchange or a join. Here each row walks its code points
  * once and emits the bucket ids directly: array element i is the
  * bucket of the i-th n-gram occurrence, where
  * `bucket = conv(substring(md5(gram), 1, 8), 16, 10) % buckets` —
  * bit-identical to the SQL formulation (first 4 md5 digest bytes as
  * an unsigned 32-bit value). md5 runs once per DISTINCT gram per row
  * (a per-row memo), not per occurrence.
  *
  * Code-point semantics match `substring`/`char_length` (and DuckDB's
  * `substr`/`len`): grams are n CODE POINTS, so supplementary-plane
  * text buckets identically on every engine. Fewer than n code points
  * → empty array; null → null. CodegenFallback per the WordNGrams
  * precedent: one virtual call per row, the loop body is compiled JVM
  * code.
  */
case class CharNGramBuckets(child: Expression, n: Int, buckets: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n-gram size must be >= 1: $n")
  require(buckets >= 2, s"bucket count must be >= 2: $buckets")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_buckets"

  override protected def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toString
    // code-point boundaries: starts(i) = UTF-16 offset of code point i
    val cpCount = str.codePointCount(0, str.length)
    if (cpCount < n) return new GenericArrayData(new Array[Long](0))
    val starts = new Array[Int](cpCount + 1)
    var off = 0
    var i = 0
    while (off < str.length) {
      starts(i) = off
      off += Character.charCount(str.codePointAt(off))
      i += 1
    }
    starts(cpCount) = str.length
    val md = MessageDigest.getInstance("MD5")
    val memo = new java.util.HashMap[String, java.lang.Long]
    val out = new Array[Long](cpCount - n + 1)
    var j = 0
    while (j + n <= cpCount) {
      val gram = str.substring(starts(j), starts(j + n))
      var b = memo.get(gram)
      if (b == null) {
        val d = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        b = java.lang.Long.valueOf(v % buckets)
        memo.put(gram, b)
      }
      out(j) = b.longValue()
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharNGramBuckets =
    copy(child = newChild)
}

object CharNGramBuckets {
  def apply(text: Column, n: Int, buckets: Int): Column =
    ColumnBridge.column(CharNGramBuckets(ColumnBridge.expression(text), n, buckets))
}
