package graft.operators

import graft.{Q, Tables}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Rounding.round // engine-identical rounding — shadows functions.round

/** PCA / whitening for embedding columns (LLM-pipeline §2.9 extension):
  * the standard pre-step before IVF/PQ indexing (decorrelate, then
  * drop low-variance directions) and the classic embedding-drift
  * diagnostic, built with the same 100 TB discipline as the
  * linear-regression head:
  *
  *  - TRAINING is ONE partial-aggregated pass: every covariance entry
  *    is a plain sum of products, carried as a 2080-dim (upper
  *    triangle of 64×64) vector through Summarizer.sum — map-side
  *    combine, a single KB-scale row reaches the driver, no iteration
  *    over data. Fully SQL-replayable → `q_pca_cov` has a complete
  *    DuckDB oracle.
  *  - The EIGENSOLVE is driver-side over that one collected row
  *    (cyclic Jacobi on the 64×64 symmetric matrix — deterministic,
  *    KB-bounded, the sketch/codebook-merge discipline).
  *  - PROJECTION broadcasts the components as literals: a zero-shuffle
  *    codegen projection, folded in index order per row (the
  *    q_embed_project determinism pattern).
  */
object Pca {

  val Dim = 64
  val TopK = 8

  /** (i, j) pairs for the flattened upper triangle, row-major — the
    * positional decoder for the Summarizer-summed product vector. */
  private val upperPairs: Seq[(Int, Int)] =
    for (i <- 1 to Dim; j <- i to Dim) yield (i, j)

  /** Per-row upper-triangle products, 2080 doubles in pair order —
    * native codegen (UpperTriProducts): the HOF formulation
    * (nested transform + element_at) paid ~2080 interpreted lambda
    * dispatches per row and made the covariance pass ~8 s at 10× sf0.1
    * where this loop makes it scan-bound. */
  private def upperTri(v: org.apache.spark.sql.Column) =
    graft.functions.expressions.VectorExpressions.upperTriProducts(v, Dim)

  /** The statistics frame: one row (n, Σxᵢ vector, Σxᵢxⱼ vector), or
    * ZERO rows on an all-null/empty corpus. Summarizer throws on empty
    * input, so a single all-zero sentinel row rides along — it adds 0
    * to every sum and is excluded from n (the `real` flag), and the
    * n > 0 filter drops the degenerate result entirely. Keeps the
    * empty-corpus case inside the plan: no driver-side pre-count. */
  private def statsFrame(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    val zero = spark.range(1)
      .select(typedLit(Seq.fill(Dim)(0.0)).as("v"), lit(0L).as("real"))
    emb.filter(col("embedding").isNotNull)
      .select(col("embedding").cast("array<double>").as("v"),
        lit(1L).as("real"))
      .unionByName(zero)
      .select(array_to_vector(col("v")).as("mv"),
        array_to_vector(upperTri(col("v"))).as("pv"), col("real"))
      .agg(sum(col("real")).as("n"), Summarizer.sum(col("mv")).as("s"),
        Summarizer.sum(col("pv")).as("p"))
      .where(col("n") > 0)
  }

  /** One-pass sufficient statistics: (n, Σxᵢ, Σxᵢxⱼ upper triangle).
    * None when the corpus has no non-null vectors. */
  private def collectStats(emb: DataFrame): Option[(Long, Array[Double], Array[Double])] = {
    val rows = statsFrame(emb)
      .select(col("n"), vector_to_array(col("s")).as("s"),
        vector_to_array(col("p")).as("p"))
      .collect()
    rows.headOption.map { r =>
      (r.getLong(0), r.getSeq[Double](1).toArray, r.getSeq[Double](2).toArray)
    }
  }

  /** Population covariance 64×64 from the sufficient statistics. */
  private def covMatrix(n: Long, s: Array[Double],
      p: Array[Double]): Array[Array[Double]] = {
    val m = Array.ofDim[Double](Dim, Dim)
    upperPairs.zipWithIndex.foreach { case ((i, j), idx) =>
      val c = (p(idx) - s(i - 1) * s(j - 1) / n) / n
      m(i - 1)(j - 1) = c
      m(j - 1)(i - 1) = c
    }
    m
  }

  /** Cyclic Jacobi eigensolve for a symmetric matrix: deterministic
    * (fixed sweep order, fixed convergence threshold), O(d³) per sweep
    * on a 64×64 — microseconds, driver-side. Returns eigenpairs sorted
    * by eigenvalue descending, each eigenvector sign-fixed so its
    * largest-|coordinate| entry is positive (the component is otherwise
    * only defined up to ±1, and determinism is part of the contract). */
  private[operators] def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (sweep < 50 && off() > 1e-20) {
      for (p <- 0 until d; q <- p + 1 until d if math.abs(a(p)(q)) > 1e-15) {
        val theta = (a(q)(q) - a(p)(p)) / (2 * a(p)(q))
        val t =
          if (theta == 0) 1.0
          else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1))
        val c = 1 / math.sqrt(t * t + 1)
        val s = t * c
        var k = 0
        while (k < d) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
          k += 1
        }
        k = 0
        while (k < d) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
          k += 1
        }
      }
      sweep += 1
    }
    val pairs = (0 until d).map { i =>
      val vec = Array.tabulate(d)(v(_)(i))
      // sign convention: largest-|coordinate| entry positive; ties
      // (exactly equal magnitudes) break on the earlier index
      var best = 0
      var j = 1
      while (j < d) { if (math.abs(vec(j)) > math.abs(vec(best))) best = j; j += 1 }
      val fixed = if (vec(best) < 0) vec.map(-_) else vec
      (a(i)(i), fixed)
    }.sortBy(-_._1)
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  /** Fit: mean vector + top-k components + ALL eigenvalues.
    * None when the corpus has no non-null vectors. */
  def fit(emb: DataFrame, k: Int = TopK)
      : Option[(Array[Double], Array[Array[Double]], Array[Double])] =
    collectStats(emb).map { case (n, s, p) =>
      val (eig, vecs) = jacobiEigen(covMatrix(n, s, p))
      (s.map(_ / n), vecs.take(k), eig)
    }

  /** Centered top-k projection: (vec_id, j, p) long format, j in 0..k-1.
    * Mean and components enter the plan as literals — zero-shuffle
    * per-row codegen, folded in index order (deterministic). */
  def project(emb: DataFrame, k: Int = TopK): DataFrame =
    fit(emb, k) match {
      case None =>
        emb.select(col("vec_id"), lit(0).as("j"), lit(0.0).as("p")).limit(0)
      case Some((mean, comps, _)) =>
        val compLit = typedLit(comps.map(_.toSeq).toSeq)
        // mean·cⱼ is a per-component CONSTANT — folded once driver-side
        // (same left-to-right order as the row fold, so centering stays
        // bit-identical to subtracting the mean per row); the row dot is
        // the native codegen vec_dot, not an interpreted zip_with fold
        val meanDots = typedLit(comps.map(c =>
          c.zip(mean).map { case (a, b) => a * b }.sum).toSeq)
        emb.filter(col("embedding").isNotNull)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("v"))
          .select(col("vec_id"), col("v"),
            explode(expr(s"sequence(0, ${k - 1})")).as("j"))
          .select(col("vec_id"), col("j"),
            round(graft.functions.VectorFunctions.dot(col("v"),
              element_at(compLit, col("j") + 1))
              - element_at(meanDots, col("j") + 1), 6).as("p"))
    }

  // ---- driver-verifiable entries ------------------------------------

  def entries: Map[String, Q] = Map(
    // the TRAINING pass — full oracle: the whole covariance matrix is
    // sums of products, replayed entry-for-entry in DuckDB
    "q_pca_cov" -> Q(
      (s, d) => {
        val pairLit = typedLit(upperPairs.map { case (i, j) => (i, j) })
        statsFrame(Tables.embeddings(s, d))
          .select(col("n"), vector_to_array(col("s")).as("s"),
            posexplode(vector_to_array(col("p"))).as(Seq("idx", "sij")))
          .select(
            element_at(pairLit, col("idx") + 1).getField("_1").as("i"),
            element_at(pairLit, col("idx") + 1).getField("_2").as("j"),
            round((col("sij")
              - element_at(col("s"), element_at(pairLit, col("idx") + 1).getField("_1"))
                * element_at(col("s"), element_at(pairLit, col("idx") + 1).getField("_2"))
                / col("n")) / col("n"), 6).as("cov"))
      },
      """WITH e AS (
        |  SELECT embedding::DOUBLE[] AS v FROM embeddings
        |  WHERE embedding IS NOT NULL
        |), pairs AS (
        |  SELECT a.i AS i, b.j AS j
        |  FROM (SELECT unnest(generate_series(1, 64)) AS i) a,
        |       (SELECT unnest(generate_series(1, 64)) AS j) b
        |  WHERE b.j >= a.i
        |), p AS (
        |  SELECT pr.i, pr.j, sum(e.v[pr.i] * e.v[pr.j]) AS sij,
        |    count(*) AS n
        |  FROM e CROSS JOIN pairs pr GROUP BY 1, 2
        |), m AS (
        |  SELECT i, sum(v[i]) AS si
        |  FROM e, LATERAL (SELECT unnest(generate_series(1, 64)) AS i)
        |  GROUP BY 1
        |)
        |SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
        |  round((p.sij - mi.si * mj.si / p.n) / p.n, 6) AS cov
        |FROM p JOIN m mi ON mi.i = p.i JOIN m mj ON mj.i = p.j""".stripMargin),

    // the PROJECTION pass — rows-only by design (the components come
    // from the driver-side Jacobi eigensolve, which SQL can't replay);
    // the solve is spec-bounded: orthonormal components, descending
    // eigenvalues, per-component projection variance = eigenvalue,
    // trace identity, deterministic reruns (OperatorsSpec)
    "q_pca_project" -> Q(
      (s, d) => project(Tables.embeddings(s, d)),
      None)
  )
}
