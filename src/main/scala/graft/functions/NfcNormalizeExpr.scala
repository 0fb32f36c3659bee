package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (canonical
  * composition) — the first cleanup step of a multilingual training-data
  * pipeline (é as U+0065+U+0301 and as U+00E9 must dedup/tokenize/count
  * identically). Spark has no normalization built-in; a Scala UDF would
  * box every row — this stays inside whole-stage codegen with one
  * already-normalized fast path (`Normalizer.isNormalized` is a cheap
  * scan; ASCII corpora never allocate).
  *
  * Engine-neutral: implements Unicode NFC exactly, so DuckDB's
  * `nfc_normalize` is a valid oracle (both follow UAX #15).
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  // pattern match, not ==: Spark 4 collated string columns are
  // StringType(collationId) instances that fail strict equality with the
  // default StringType but normalize identically (NFC is collation-blind)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects a STRING argument, got ${other.sql}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalizeExpr.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Static kernel shared by eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column wrapper for the DataFrame API. */
  def nfcNormalize(c: Column): Column =
    Bridge.column(NfcNormalizeExpr(Bridge.expression(c)))
}
