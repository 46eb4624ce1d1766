package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass MinHash signature over a pre-hashed shingle array.
  *
  * The HOF formulation (`transform(sequence(0,k-1), j -> aggregate(...))`)
  * is interpreted per lambda element — k separate walks with boxed lambda
  * dispatch, outside whole-stage codegen. This expression computes all k
  * permutation minima in ONE tight loop over the array (k*|shingles|
  * multiply-add-mods per row, no allocation beyond the output).
  *
  * Permutation family (must stay in sync with the DuckDB oracle in
  * graft.operators.Dedup): h_j(x) = ((2j+1)*x + 12345j + 7) mod 2147483647.
  */
case class MinHashSignature(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // null slots are absent shingles, not hash value 0 — skipping
      // them keeps signatures honest (getLong on a null slot reads 0,
      // which would collapse every permutation's min to h_j(0))
      if (arr.isNullAt(i)) { i += 1 }
      else {
      val x = arr.getLong(i)
      var j = 0
      while (j < k) {
        val h = ((2L * j + 1L) * x + 12345L * j + 7L) % 2147483647L
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  long $x = $a.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $h = ((2L * $j + 1L) * $x + 12345L * $j + 7L) % 2147483647L;
         |    if ($h < $mins[$j]) $mins[$j] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}
