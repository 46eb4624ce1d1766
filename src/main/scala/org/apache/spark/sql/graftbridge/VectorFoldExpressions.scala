package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (see
  * graft.functions.VectorFunctions for the public API and rationale).
  * Located under org.apache.spark.sql because ExpectsInputTypes /
  * AbstractDataType are private[sql]. Fold order is the same sequential
  * left-to-right as the HOF formulation, so results are bit-identical
  * for equal-length inputs; mismatched lengths FAIL FAST (the HOF form
  * yields NULL via zip_with padding) — a partial sum would mis-rank.
  */
abstract class BinaryVectorFold extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  /** Per-element summand, as Java source: (xi, yi) -> expr. */
  protected def combineJava(x: String, y: String): String
  protected def combine(x: Double, y: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // fail fast on dimension mismatch: a partial sum over min(lengths)
    // would look like a plausible score and silently mis-rank
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: vector lengths differ (${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += combine(x.getDouble(i), y.getDouble(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: vector lengths differ (" + $a.numElements()
         |      + " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $s += ${combineJava(xi, yi)};
         |}
         |${ev.value} = $s;
         |""".stripMargin
    })
}

case class DotProduct(left: Expression, right: Expression) extends BinaryVectorFold {
  override protected def combineJava(x: String, y: String): String = s"$x * $y"
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

case class SquaredL2Distance(left: Expression, right: Expression) extends BinaryVectorFold {
  override protected def combineJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def combine(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "vec_l2sq"
}
