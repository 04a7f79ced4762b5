package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object NfcNormalize {
  /** NFC via the JDK's Normalizer (the Unicode-standard composition —
    * DuckDB's `nfc_normalize` implements the same algorithm, which is
    * what lets the oracle hash-match byte-for-byte). Fast path: most
    * corpus text is already NFC, and `isNormalized` runs the quick-
    * check property scan without allocating, so the common row costs
    * one pass and ZERO copies.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization of a string column — the canonicalization
  * pass text pipelines run before any hashing or dedup (Dolma/CCNet
  * normalize early so "café" spelled precomposed and decomposed dedup
  * together; un-normalized text splits exact-dedup classes and skews
  * every char-denominated metric). In-row, codegen'd, no UDF.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.NfcNormalize.nfc($s);")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}
