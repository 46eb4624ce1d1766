package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Jaccard similarity of two SORTED distinct long arrays via a merge walk:
  * O(n+m) per pair, zero allocation — vs array_intersect/array_union which
  * build a hash set per pair. In pair-scoring joins this evaluates millions
  * of times per task; sorting happens once per ROW (pre-join projection),
  * not once per pair.
  *
  * Inputs MUST be sorted ascending with distinct elements (use
  * sort_array(array_distinct(...))); result is |A∩B| / |A∪B|, 0 when both
  * empty.
  */
case class JaccardSorted(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { inter += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    val union = n + m - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val u = ctx.freshName("u")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0, $j = 0, $inter = 0;
         |while ($i < $n && $j < $m) {
         |  long $xi = $a.getLong($i);
         |  long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $inter++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |int $u = $n + $m - $inter;
         |${ev.value} = $u == 0 ? 0.0 : ((double) $inter) / $u;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_sorted"
}
