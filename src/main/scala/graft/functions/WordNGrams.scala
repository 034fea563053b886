package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-`n`-grams of a string in ONE per-row pass — the native
  * replacement for the `array_distinct(transform(sequence(...), i =>
  * concat_ws(" ", slice(split(text," "), i, n))))` higher-order pipeline,
  * whose lambdas Spark evaluates interpreted (per-element closure calls
  * plus an array copy per slice).
  *
  * Semantics match the HOF formulation exactly: tokens are
  * `split(text, " ", -1)` (single-space separators, empties kept), a gram
  * is tokens i..i+n-1 re-joined by single spaces — which, because every
  * separator is exactly one space, is just `text.substring(start_i,
  * end_{i+n-1})`; no token materialization at all. Distinctness keeps
  * first-occurrence order (= array_distinct). Fewer than `n` tokens →
  * empty array, null text → null.
  *
  * CodegenFallback is fine here: one virtual call per ROW amortized over
  * the whole scan-shingle loop (same trade as MinHashSig); the loop body
  * itself is compiled JVM code, not interpreted Catalyst lambdas.
  */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n-gram size must be >= 1: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val len = s.length
    // token boundaries of split-on-" " with limit -1 (trailing empties kept)
    var m = 1 // token count = spaces + 1
    var i = 0
    while (i < len) { if (s.charAt(i) == ' ') m += 1; i += 1 }
    val starts = new Array[Int](m)
    val ends = new Array[Int](m)
    var t = 0
    i = 0
    starts(0) = 0
    while (i < len) {
      if (s.charAt(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = len
    val out = new java.util.LinkedHashSet[UTF8String]
    var j = 0
    while (j + n <= m) {
      out.add(UTF8String.fromString(s.substring(starts(j), ends(j + n - 1))))
      j += 1
    }
    val arr = new Array[AnyRef](out.size)
    out.toArray(arr)
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(WordNGrams(ColumnBridge.expression(text), n))
}
