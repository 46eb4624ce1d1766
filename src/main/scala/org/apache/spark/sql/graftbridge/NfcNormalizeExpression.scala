package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a native codegen
  * expression — Spark has no built-in for it, and text dedup/fingerprint
  * pipelines need byte-identical text before hashing: 'é' as U+00E9 and
  * as U+0065+U+0301 are the same document to a human and different md5s
  * to a dedup pass. Name and semantics match DuckDB's `nfc_normalize`,
  * so oracle SQL is symmetric. java.text.Normalizer is stateless and
  * thread-safe, so unlike the digest-based expressions no ThreadLocal is
  * needed. Fast path: Normalizer.isNormalized is a cheap scan and nearly
  * all real corpus text is already NFC — skip the composing pass then.
  */
case class NfcNormalize(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("str")
      s"""
         |java.lang.String $s = $in.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)
         |  ? $in
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "nfc_normalize"
}
