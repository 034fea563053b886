package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native expression — step ZERO of real
  * text dedup: `é` arrives both precomposed (U+00E9) and decomposed
  * (`e` + U+0301), and every downstream hash/shingle/fingerprint treats
  * them as different documents unless the corpus is normalized first.
  * Spark ships no normalizer; this wraps `java.text.Normalizer` as a
  * per-row expression (CodegenFallback — one virtual call per row, the
  * WordNGrams trade) with the form fixed at plan time.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for virtually every row of a mostly-ASCII corpus — only the
  * rare decorated row pays for the rewrite. Forms: NFC/NFD/NFKC/NFKD
  * (use NFKC for dedup keys — it also folds compatibility variants
  * like ﬁ ligatures and full-width forms).
  */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {
  private val normalizerForm = Normalizer.Form.valueOf(form.toUpperCase)

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, normalizerForm)) input
    else UTF8String.fromString(Normalizer.normalize(s, normalizerForm))
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  def apply(text: Column, form: String): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(text), form))
}
