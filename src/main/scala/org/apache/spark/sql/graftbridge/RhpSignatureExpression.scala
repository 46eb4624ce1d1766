package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signature over an array<double> vector.
  *
  * Hyperplane components are ±1, packed as sign bitmasks: hyperplane j,
  * dimension i has sign +1 iff bit (i % 64) of `signMasks(j)(i / 64)` is
  * set. The masks are derived deterministically by the caller (md5-based)
  * and baked into the plan — reproducible across executors with zero
  * state shipping, and the whole signature is one tight codegen loop
  * instead of an nBits*dim-term expression tree (which is slow to plan
  * and breaks codegen size limits as dims grow).
  *
  * Returns a long with nBits sign bits: bit j set iff dot(v, hp_j) > 0.
  */
case class RhpSignature(child: Expression, signMasks: Seq[Seq[Long]])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType

  @transient private lazy val masks: Array[Array[Long]] =
    signMasks.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var sig = 0L
    var j = 0
    while (j < masks.length) {
      val mask = masks(j)
      // cap at the mask's bit capacity: dims beyond the declared width
      // have no derived sign — reading past would index out of bounds
      // (or pull padding bits), so they are excluded from the projection
      val lim = math.min(n, mask.length << 6)
      var proj = 0.0
      var i = 0
      while (i < lim) {
        val sign = if (((mask(i >>> 6) >>> (i & 63)) & 1L) == 1L) 1.0 else -1.0
        proj += v.getDouble(i) * sign
        i += 1
      }
      if (proj > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val masksRef = ctx.addReferenceObj("signMasks", masks, "long[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val proj = ctx.freshName("proj"); val mask = ctx.freshName("mask")
      s"""
         |int $n = $v.numElements();
         |long $sig = 0L;
         |for (int $j = 0; $j < ${masks.length}; $j++) {
         |  long[] $mask = $masksRef[$j];
         |  int ${i}_lim = java.lang.Math.min($n, $mask.length << 6);
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < ${i}_lim; $i++) {
         |    $proj += $v.getDouble($i)
         |      * ((($mask[$i >>> 6] >>> ($i & 63)) & 1L) == 1L ? 1.0 : -1.0);
         |  }
         |  if ($proj > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "rhp_signature"
}
