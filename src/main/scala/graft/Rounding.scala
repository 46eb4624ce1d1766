package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor => ieeeFloor, lit}

/** Engine-identical decimal rounding shared by every query/oracle pair.
  *
  * Why this exists (round-6 driver red, `q_embed_project`): Spark's
  * `round(col, n)` rounds the shortest-decimal representation HALF_UP via
  * BigDecimal, while DuckDB's `round(DOUBLE, n)` rounds the binary value —
  * on half-boundary doubles (any value whose decimal repr lands on
  * `x.xxx5`) the two engines disagree (~2.75% of boundary doubles in a 50k
  * sweep: `-388.15885` → DuckDB `-388.1588`, Spark `-388.1589`). With
  * bit-identical inputs the compare can still flip, so EVERY rounded oracle
  * was one datum away from a hash red.
  *
  * The fix is one recipe made of primitive IEEE-754 ops that both engines
  * implement identically: `floor(x * 1eN + 0.5) / 1eN`.
  *   - `x * 1eN`, `+ 0.5`, `/ 1eN` are single IEEE double ops — bit-equal
  *     on both engines for bit-equal x (powers of ten up to 1e15 are exact
  *     doubles; the scales used here are 0..6).
  *   - `floor` truncates toward −∞ on both (Spark emits BIGINT, DuckDB
  *     DOUBLE — equal as reals for |v| < 2^53, and the final division by
  *     the same power of ten is the same IEEE op on both).
  *   - Negatives round half-toward-+∞ on BOTH engines (floor(-2.0) after
  *     `-2.5 + 0.5` is -2) — a deliberate, engine-identical convention.
  *
  * Spark side: operator files `import graft.Rounding.round` AFTER the
  * `functions._` wildcard — the explicit import shadows
  * `functions.round`, so every existing `round(expr, n)` call site routes
  * here without edits. DuckDB side: [[SparkEntry.oracleSql]] routes every
  * oracle string through [[rewriteSql]], which rewrites each textual
  * `round(expr, n)` into the same floor recipe.
  */
object Rounding {

  /** Half-up (toward +∞) rounding to `scale` decimal places, as a pure
    * IEEE-double expression. Output type is DOUBLE (Spark `floor` yields
    * BIGINT; dividing by the double power of ten restores DOUBLE, exactly
    * mirroring DuckDB's DOUBLE floor + division).
    */
  def round(c: Column, scale: Int): Column = {
    // The engine-identical envelope holds only for non-negative scales up
    // to 1e15 (exact double powers of ten; Spark's BIGINT floor overflows
    // past 2^63 regardless of scale, but 0..15 keeps the recipe itself
    // exact). A negative scale would make math.pow(10, -n) inexact and
    // silently break bit-parity — refuse it at the call site.
    require(scale >= 0 && scale <= 15, s"round scale must be in 0..15, got $scale")
    val p = math.pow(10, scale) // exact double for scale <= 15
    ieeeFloor(c.cast("double") * lit(p) + lit(0.5)) / lit(p)
  }

  /** SQL text of the identical recipe, for hand-written oracle fragments. */
  def sqlRecipe(expr: String, scale: Int): String =
    s"(floor(CAST(($expr) AS DOUBLE) * 1e$scale + 0.5) / 1e$scale)"

  /** Rewrite every 2-arg `round(expr, n)` (n an integer literal) in a
    * DuckDB oracle SQL string into [[sqlRecipe]]. Balanced-paren scan that
    * is quote-aware (single-quoted SQL literals are copied verbatim) and
    * recursive (nested `round` inside the expr is rewritten too). Calls
    * that don't match the 2-arg-int shape are left untouched.
    */
  def rewriteSql(sql: String): String = {
    val sb = new StringBuilder(sql.length + 64)
    var i = 0
    while (i < sql.length) {
      val ch = sql.charAt(i)
      if (ch == '\'') { // copy quoted literal verbatim ('' is an escaped quote)
        val end = endOfQuoted(sql, i)
        sb.append(sql.substring(i, end)); i = end
      } else if (isRoundToken(sql, i)) {
        val open = nextNonSpace(sql, i + 5)
        val close = matchParen(sql, open)
        val inner = sql.substring(open + 1, close)
        splitTwoArgs(inner) match {
          case Some((expr, scale)) =>
            sb.append(sqlRecipe(rewriteSql(expr.trim), scale))
          case None => // not the 2-arg-int shape: keep, but rewrite inside
            sb.append(sql.substring(i, open + 1)).append(rewriteSql(inner)).append(')')
        }
        i = close + 1
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }

  /** `round` as a word, followed (after spaces) by `(` — not part of a
    * longer identifier like `around` or `round_half`. */
  private def isRoundToken(s: String, i: Int): Boolean = {
    val word = i + 5 <= s.length && s.regionMatches(true, i, "round", 0, 5)
    def bBefore = i == 0 || !isIdent(s.charAt(i - 1))
    def bAfter = { val j = nextNonSpace(s, i + 5); j < s.length && s.charAt(j) == '(' }
    word && bBefore && i + 5 < s.length && !isIdent(s.charAt(i + 5)) && bAfter
  }

  private def isIdent(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  private def nextNonSpace(s: String, from: Int): Int = {
    var j = from
    while (j < s.length && Character.isWhitespace(s.charAt(j))) j += 1
    j
  }

  private def endOfQuoted(s: String, start: Int): Int = {
    var j = start + 1
    while (j < s.length) {
      if (s.charAt(j) == '\'') {
        if (j + 1 < s.length && s.charAt(j + 1) == '\'') j += 2 else return j + 1
      } else j += 1
    }
    j
  }

  /** Index of the `)` matching the `(` at `open` (quote-aware). */
  private def matchParen(s: String, open: Int): Int = {
    require(open < s.length && s.charAt(open) == '(', s"expected '(' at $open in: $s")
    var depth = 0
    var j = open
    while (j < s.length) {
      s.charAt(j) match {
        case '\'' => j = endOfQuoted(s, j) - 1
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return j
        case _ =>
      }
      j += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens after $open in: $s")
  }

  /** Split `expr, n` at the single top-level comma; Some only when the
    * tail is a bare integer literal. */
  private def splitTwoArgs(inner: String): Option[(String, Int)] = {
    var depth = 0
    var j = 0
    var last = -1
    while (j < inner.length) {
      inner.charAt(j) match {
        case '\'' => j = endOfQuoted(inner, j) - 1
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 => last = j
        case _ =>
      }
      j += 1
    }
    if (last < 0) None
    else {
      val tail = inner.substring(last + 1).trim
      if (tail.matches("-?\\d+")) Some((inner.substring(0, last), tail.toInt))
      else None
    }
  }
}
