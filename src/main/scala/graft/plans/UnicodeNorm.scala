package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(s)`: Unicode NFC normalization as a native codegen
  * expression — Spark has no built-in normalizer, but text dedup and
  * fingerprinting are wrong without one: the SAME visible string can
  * arrive composed ("é" U+00E9) or decomposed ("e"+U+0301) depending on
  * the source system, and every hash-keyed dedup (q26/q95/q98) treats
  * those as distinct documents. Canonical composition (java.text
  * .Normalizer, Form.NFC — the JDK's implementation of UAX #15) makes
  * byte-level keys mean character-level identity.
  *
  * A codegen Expression (not a UDF) for the same reason as RollingHash:
  * the call inlines into whole-stage codegen with no boxing or closure
  * dispatch per row. DuckDB ships the identical UAX #15 transform as
  * its built-in `nfc_normalize`, which is what the q111 oracle uses —
  * two independent implementations of the public algorithm pinned
  * byte-for-byte against each other.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string argument, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($x.toString(),
         |    java.text.Normalizer.Form.NFC));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
