package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Stable 32-bit hash: the first 4 bytes of md5(input) as an unsigned
  * long — bit-identical to `('0x' || substr(md5(s), 1, 8))::BIGINT`
  * (DuckDB) and `conv(substring(md5(s), 1, 8), 16, 10)` (Spark SQL), but
  * computed directly from the digest bytes: no hex-string encode, no
  * base-16 string parse. Evaluated ~1M times per task in MinHash
  * shingling, where the string round-trip dominated.
  */
case class StableHash32(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  // ThreadLocal: Catalyst expressions must be thread-safe unless marked
  // Stateful — a shared digest would interleave update/digest across
  // threads and emit silently wrong hashes
  @transient private lazy val md =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(input.asInstanceOf[UTF8String].getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdRef = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }"""
        .stripMargin)
    nullSafeCodeGen(ctx, ev, in => {
      val d = ctx.freshName("digest")
      // NOTE: generated continuation lines must never START with `|` —
      // Spark's code-block formatting strips a leading pipe as if it
      // were a stripMargin char, which silently split this expression
      // into two statements and failed Janino ("... is not a type"),
      // demoting every projection using stable_hash32 to interpreted
      // eval (bench's count() pruned the projection, so only
      // write-backed plans ever hit it). Operators go at end-of-line.
      s"""
         |$mdRef.reset();
         |byte[] $d = $mdRef.digest($in.getBytes());
         |${ev.value} = (($d[0] & 0xffL) << 24) | (($d[1] & 0xffL) << 16) |
         |  (($d[2] & 0xffL) << 8) | ($d[3] & 0xffL);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "stable_hash32"
}
