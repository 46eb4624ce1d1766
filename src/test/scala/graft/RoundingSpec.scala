package graft

import org.apache.spark.sql.functions.col

/** The shared engine-identical rounding recipe (see [[Rounding]]).
  * Column-side behavior is covered by every oracle-gated query; these
  * specs pin the SQL rewriter and the half-boundary convention.
  */
class RoundingSpec extends SparkSpec {

  test("rewriteSql rewrites a simple 2-arg round") {
    assert(Rounding.rewriteSql("SELECT round(x, 2) AS r FROM t") ===
      "SELECT (floor(CAST((x) AS DOUBLE) * 1e2 + 0.5) / 1e2) AS r FROM t")
  }

  test("rewriteSql handles nested rounds and bracketed/parenthesized commas") {
    val in = "round(list_sum([f(x, 1) FOR x IN v]) / round(n, 0), 4)"
    val out = Rounding.rewriteSql(in)
    assert(out === "(floor(CAST((list_sum([f(x, 1) FOR x IN v]) / " +
      "(floor(CAST((n) AS DOUBLE) * 1e0 + 0.5) / 1e0)) AS DOUBLE) * 1e4 + 0.5) / 1e4)")
  }

  test("rewriteSql leaves quoted literals verbatim, including round( and quotes") {
    val in = "SELECT 'round(x, 2)', 'it''s', '(' || c FROM t WHERE c LIKE '%)%'"
    assert(Rounding.rewriteSql(in) === in)
  }

  test("rewriteSql leaves non-2-arg-int calls and identifiers alone") {
    assert(Rounding.rewriteSql("SELECT around(x, 2), my_round(y, 1) FROM t") ===
      "SELECT around(x, 2), my_round(y, 1) FROM t")
    // single-arg round: untouched (no call site uses it, but don't mangle)
    assert(Rounding.rewriteSql("SELECT round(x) FROM t") === "SELECT round(x) FROM t")
    // non-literal scale: untouched
    assert(Rounding.rewriteSql("SELECT round(x, n) FROM t") === "SELECT round(x, n) FROM t")
  }

  test("rewriteSql is a no-op on round-free SQL with quotes") {
    val in = """SELECT coalesce(regexp_extract(url, '^([a-z]+)://', 1), '') FROM u"""
    assert(Rounding.rewriteSql(in) === in)
  }

  test("Column round matches the floor recipe on half-boundary doubles") {
    import spark.implicits._
    // -388.15885 is the round-6 divergence witness: BigDecimal HALF_UP says
    // -388.1589, the binary-value recipe says -388.1588 on both engines.
    val df = Seq(-388.15885, 2.5, -2.5, 0.0, 1.00005).toDF("x")
      .select(Rounding.round(col("x"), 4).as("r4"), Rounding.round(col("x"), 0).as("r0"))
    val rows = df.collect()
    assert(rows.map(_.getDouble(0)).toSeq ===
      Seq(-388.1588, 2.5, -2.5, 0.0, 1.0) .zip(
        Seq(-388.15885, 2.5, -2.5, 0.0, 1.00005)).map { case (_, x) =>
        math.floor(x * 1e4 + 0.5) / 1e4 })
    assert(rows.map(_.getDouble(1)).toSeq ===
      Seq(-388.15885, 2.5, -2.5, 0.0, 1.00005).map(x => math.floor(x + 0.5)))
  }

  test("Column round propagates NULL") {
    val df = spark.sql("SELECT CAST(NULL AS DOUBLE) AS x")
      .select(Rounding.round(col("x"), 2).as("r"))
    assert(df.collect().head.isNullAt(0))
  }
}
