package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen expression — the
  * record-linkage scorer (names, titles, short identifiers) that Spark's
  * function library lacks (it ships only levenshtein). Semantics are
  * pinned to DuckDB's `jaro_winkler_similarity` so the oracle replays
  * symmetrically, matching its empirically-probed conventions:
  *   - either side empty → 0.0 (not 1.0 on both-empty);
  *   - Jaro match window = max(|a|,|b|)/2 - 1, floored at 0;
  *   - the Winkler prefix boost (weight 0.1, prefix capped at 4) applies
  *     only when the Jaro score exceeds 0.7 (the standard boost
  *     threshold — verified: jaro 0.5 with a 2-char common prefix stays
  *     0.5 in DuckDB).
  *
  * In blocked entity-resolution joins this evaluates once per candidate
  * pair — millions of times per task — so the whole scorer is a single
  * static call inside whole-stage codegen: no UDF serialization, no
  * row-level interpretation, flag arrays sized to the (short) inputs.
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = org.apache.spark.sql.graftbridge.JaroWinklerImpl
         |  .similarity($a, $b);
         |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "jaro_winkler"
}

/** The scorer itself, as a top-level object so Scala emits a static
  * forwarder the generated Java can call directly. Operates on char
  * units (the corpus here is ASCII; DuckDB walks UTF-8 units the same
  * way for ASCII inputs).
  */
object JaroWinklerImpl {
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val ca = a.charAt(i)
      var j = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && b.charAt(j) == ca) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: matched chars out of relative order. The two
    // matched subsequences are permutations of each other but can still
    // differ in an ODD number of positions ('abc' vs 'bca' differs in
    // 3) — DuckDB floors the halving (t = halves/2 integer division),
    // verified empirically, so floor here too or long inputs drift.
    var halves = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) halves += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val t = (halves / 2).toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    // Winkler prefix boost, prefix capped at 4
    var l = 0
    val cap = math.min(4, math.min(la, lb))
    while (l < cap && a.charAt(l) == b.charAt(l)) l += 1
    jaro + 0.1 * l * (1.0 - jaro)
  }
}
