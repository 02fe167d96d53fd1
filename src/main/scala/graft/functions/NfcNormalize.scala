package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftcol.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared algorithm body (interpreted eval + generated code call the same
  * static method — the JaroWinklerAlgo pattern). Fast path: NFC can only
  * change text containing non-ASCII sequences, and `Normalizer.isNormalized`
  * is a cheap scan — when it holds (the overwhelming majority of crawled
  * text), the input UTF8String is returned WITHOUT any decode/re-encode or
  * allocation. Only the rare decomposed row pays the String round-trip.
  */
object NfcNormalizeAlgo {
  def compute(in: UTF8String): UTF8String = {
    val s = in.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) in
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

/** Native Catalyst expression: Unicode NFC normalization.
  *
  * Why custom: text curation's FIRST transform — the same logical character
  * must hash/shingle/dedup identically whether a crawler delivered it
  * precomposed (é) or decomposed (e + U+0301); every downstream operator in
  * this catalog (MinHash shingles, SimHash, exact dedup, fingerprints) keys
  * on bytes, so normalization must happen before any of them. Spark ships no
  * normalizer function; a Scala UDF would box every row and break the
  * codegen stage this sits in (the JDK's java.text.Normalizer does the
  * actual Unicode work — public platform API, no extra dependency).
  *
  * Cross-engine contract: DuckDB's independent `nfc_normalize` must agree
  * byte-for-byte (q157).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(in: Any): Any =
    NfcNormalizeAlgo.compute(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalizeAlgo.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column-API entry point: `nfc_normalize(s)`. */
  def apply(s: Column): Column = toColumn(NfcNormalize(toExpression(s)))
}
