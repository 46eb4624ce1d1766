package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Rounding.round // engine-identical rounding — shadows functions.round

/** Distributed linear-regression training over the document corpus
  * (LLM-pipeline §2.10 extension): closed-form least squares where the
  * ONLY distributed work is a single partial-aggregated pass of
  * sufficient statistics — the architecture that trains a linear/
  * logistic quality head over 100 TB without any iteration over data.
  *
  * X'X for d features is d(d+1)/2 sums of products and X'y is d more:
  * every entry is a plain `sum(expr)` that partial-aggregates map-side,
  * so the full training pass is ONE scan + a single-row shuffle,
  * identical in shape to q_stats' moment aggregation. The d×d solve
  * (Gaussian elimination with partial pivoting) happens on the driver
  * over one collected row — KB-bounded, the same discipline as the
  * sketch/codebook merges — and the learned weights broadcast back as
  * literals, so scoring is a zero-shuffle projection.
  *
  * The model itself: predict a document's DISTINCT-word count from
  * (chars, words, chars/word). Vocabulary richness correlates with
  * length but not linearly — the residual is a cheap lexical-diversity
  * signal (big negative residual = repetitive doc), the same family of
  * quality feature the Gopher repetition rules capture.
  */
object Regression {

  /** Per-doc feature/target frame: intercept, chars, words, chars/word
    * → distinct words. Chars and words are integer-valued, so their
    * sums of products are EXACT in double on both engines; only the
    * ratio feature's sums carry last-ulp noise (rounded in the oracle
    * compare). */
  private def feats(docs: DataFrame): DataFrame = {
    val chars = length(col("text")).cast("double")
    val nWords = size(split(col("text"), " ")).cast("double")
    docs.select(
      col("doc_id"),
      chars.as("x1"),
      nWords.as("x2"),
      (chars / nWords).as("x3"),
      size(array_distinct(split(col("text"), " "))).cast("double").as("y"))
  }

  /** Sufficient statistics, one row: n, Σxᵢ, Σxᵢxⱼ (upper triangle),
    * Σy, Σxᵢy, Σy² — everything the normal equations and R² need. */
  def suffStats(docs: DataFrame): DataFrame = {
    val f = feats(docs)
    def s(c: Column, name: String) = round(sum(c), 2).as(name)
    f.agg(
      count(lit(1)).as("n"),
      s(col("x1"), "s1"), s(col("x2"), "s2"), s(col("x3"), "s3"),
      s(col("x1") * col("x1"), "s11"), s(col("x1") * col("x2"), "s12"),
      s(col("x1") * col("x3"), "s13"), s(col("x2") * col("x2"), "s22"),
      s(col("x2") * col("x3"), "s23"), s(col("x3") * col("x3"), "s33"),
      s(col("y"), "sy"), s(col("x1") * col("y"), "s1y"),
      s(col("x2") * col("y"), "s2y"), s(col("x3") * col("y"), "s3y"),
      s(col("y") * col("y"), "syy"))
  }

  /** Solve the 4×4 normal equations from ONE collected stats row.
    * Returns (weights w0..w3, r²). Gaussian elimination with partial
    * pivoting — the matrix is tiny and well-conditioned enough for the
    * feature scales here; a production head would center/scale first. */
  def fit(docs: DataFrame): (Array[Double], Double) = {
    val r = suffStats(docs).head()
    val n = r.getAs[Long]("n").toDouble
    def g(c: String) = r.getAs[Double](c)
    if (n == 0) return (new Array[Double](4), 0.0)
    val a = Array(
      Array(n, g("s1"), g("s2"), g("s3")),
      Array(g("s1"), g("s11"), g("s12"), g("s13")),
      Array(g("s2"), g("s12"), g("s22"), g("s23")),
      Array(g("s3"), g("s13"), g("s23"), g("s33")))
    val b = Array(g("sy"), g("s1y"), g("s2y"), g("s3y"))
    // Degenerate inputs (one row, constant features) make the full 4×4
    // singular. Fall back deterministically: drop trailing features
    // (x3, then x2, then x1) until the reduced system solves —
    // intercept-only (the target mean, pivot = n ≥ 1) always does.
    // Dropped features keep weight 0, so scoring stays a total
    // function on any input; non-degenerate corpora solve at 4×4 on
    // the first try and are bit-identical to the direct solve.
    val w = new Array[Double](4)
    var dim = 4
    var solved = false
    while (!solved && dim >= 1) {
      try {
        val sub = solve(Array.tabulate(dim, dim)(a(_)(_)), Array.tabulate(dim)(b(_)))
        var i = 0
        while (i < dim) { w(i) = sub(i); i += 1 }
        solved = true
      } catch { case _: IllegalArgumentException => dim -= 1 }
    }
    // R² from the same stats: SSE = Σy² − w·X'y, SST = Σy² − (Σy)²/n
    val xty = Array(g("sy"), g("s1y"), g("s2y"), g("s3y"))
    val sse = g("syy") - w.indices.map(i => w(i) * xty(i)).sum
    val sst = g("syy") - g("sy") * g("sy") / n
    (w, if (sst > 0) 1.0 - sse / sst else 0.0)
  }

  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val d = b.length
    for (col0 <- 0 until d) {
      val p = (col0 until d).maxBy(r => math.abs(a(r)(col0)))
      val (ta, tb) = (a(col0), b(col0)); a(col0) = a(p); a(p) = ta
      b(col0) = b(p); b(p) = tb
      require(math.abs(a(col0)(col0)) > 1e-12, "singular normal equations")
      for (r <- col0 + 1 until d) {
        val f = a(r)(col0) / a(col0)(col0)
        for (c <- col0 until d) a(r)(c) -= f * a(col0)(c)
        b(r) -= f * b(col0)
      }
    }
    val w = new Array[Double](d)
    for (r <- d - 1 to 0 by -1) {
      var acc = b(r)
      for (c <- r + 1 until d) acc -= a(r)(c) * w(c)
      w(r) = acc / a(r)(r)
    }
    w
  }

  /** Score every document with the fitted head: prediction + residual.
    * Weights enter as LITERALS (broadcast by construction) — the
    * scoring pass is a zero-shuffle projection over the corpus scan. */
  def scoreResiduals(docs: DataFrame): DataFrame = {
    val (w, _) = fit(docs)
    val f = feats(docs)
    val pred = lit(w(0)) + lit(w(1)) * col("x1") +
      lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
    f.select(col("doc_id"), round(pred, 4).as("predicted"),
      round(col("y") - pred, 4).as("residual"))
  }

  // ---- driver-verifiable entries ------------------------------------

  def entries: Map[String, Q] = Map(
    // the TRAINING pass — full oracle: every sufficient statistic is a
    // plain sum of products, so DuckDB replays the whole thing
    "q_linreg_stats" -> Q(
      (s, d) => suffStats(Tables.documents(s, d)),
      """SELECT count(*) AS n,
        |  round(sum(x1), 2) AS s1, round(sum(x2), 2) AS s2,
        |  round(sum(x3), 2) AS s3,
        |  round(sum(x1 * x1), 2) AS s11, round(sum(x1 * x2), 2) AS s12,
        |  round(sum(x1 * x3), 2) AS s13, round(sum(x2 * x2), 2) AS s22,
        |  round(sum(x2 * x3), 2) AS s23, round(sum(x3 * x3), 2) AS s33,
        |  round(sum(y), 2) AS sy, round(sum(x1 * y), 2) AS s1y,
        |  round(sum(x2 * y), 2) AS s2y, round(sum(x3 * y), 2) AS s3y,
        |  round(sum(y * y), 2) AS syy
        |FROM (
        |  SELECT CAST(length(text) AS DOUBLE) AS x1,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS x2,
        |    CAST(length(text) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS x3,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS y
        |  FROM documents)""".stripMargin),

    // the SCORING pass — rows-only by design (the weights come from the
    // driver-side 4×4 solve, which SQL can't replay); the solve itself
    // is spec-bounded: gradient ≈ 0 at the solution, R² ∈ (0, 1],
    // residuals mean ≈ 0 (OperatorsSpec)
    "q_linreg_score" -> Q(
      (s, d) => scoreResiduals(Tables.documents(s, d)),
      None)
  )
}
