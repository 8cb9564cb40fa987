package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** NFC-normalization kernel shared by interpreted eval and generated
  * code (static forwarder, same pattern as [[CompressKernels]]).
  * `Normalizer.isNormalized` short-circuits the common already-NFC
  * case (all-ASCII text never allocates).
  */
object TextNormKernels {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object TextNorm {

  /** Unicode NFC normalization of a string column. */
  def nfcNormalize(s: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(s)))
}

/** Unicode NFC normalization — Spark ships no normalization builtin,
  * and a Scala UDF here would box every row and fence off whole-stage
  * codegen; this expression stays a single static call inside the
  * generated projection. Composed-vs-decomposed representation is a
  * classic silent dedup killer: "é" (U+00E9) and "é" hash
  * differently but render identically, so canonicalization belongs
  * BEFORE any content-hash / shingle step.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"NfcNormalize expects STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(in: Any): Any =
    TextNormKernels.nfc(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormKernels.nfc($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
