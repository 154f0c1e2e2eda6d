package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (ClickHouse's normalizeUTF8NFC/NFD/NFKC/NFKD
  * family) via the JDK's Normalizer — the canonical pre-fingerprint /
  * pre-dedup text cleanup (composed vs decomposed accents must not
  * make two copies of a document look distinct). Interpreted eval
  * (CodegenFallback) is fine here: normalization cost dwarfs per-row
  * dispatch, same trade [[TextHashes]] documents. */
case class NormalizeUtf8(child: Expression, form: Normalizer.Form)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = s"normalizeUTF8${form.name}"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Normalizer.normalize(input.asInstanceOf[UTF8String].toString, form))

  override protected def withNewChildInternal(newChild: Expression): NormalizeUtf8 =
    copy(child = newChild)
}
