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

/** Upper-triangle outer products of a vector with itself: d(d+1)/2
  * doubles in row-major (i ≤ j) order — the per-row summand of a
  * one-pass covariance aggregation (graft.operators.Pca).
  *
  * The HOF formulation (nested transform + element_at) walks ~d²/2
  * interpreted lambda calls per row outside whole-stage codegen — at
  * d = 64 that is 2080 boxed dispatches per row and dominated the
  * covariance pass ~40× over this tight loop. Dimension is checked
  * against the declared `dim` and fails fast: a short vector would
  * otherwise produce a plausible-looking but misaligned product array.
  */
case class UpperTriProducts(child: Expression, dim: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private val outLen = dim * (dim + 1) / 2

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"$prettyName: expected dim $dim, got ${v.numElements()}")
    val out = new Array[Double](outLen)
    var k = 0
    var i = 0
    while (i < dim) {
      val xi = v.getDouble(i)
      var j = i
      while (j < dim) { out(k) = xi * v.getDouble(j); k += 1; j += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val xi = ctx.freshName("xi")
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: expected dim $dim, got " + $a.numElements());
         |}
         |double[] $out = new double[$outLen];
         |int $k = 0;
         |for (int $i = 0; $i < $dim; $i++) {
         |  double $xi = $a.getDouble($i);
         |  for (int $j = $i; $j < $dim; $j++) {
         |    $out[$k++] = $xi * $a.getDouble($j);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "vec_upper_products"
}
