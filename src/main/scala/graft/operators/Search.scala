package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Rounding.round // engine-identical rounding — shadows functions.round (see Rounding)

/** Keyword-search relevance over the document corpus (SURVEY.md §2.10
  * extension): TF-IDF term weighting, BM25 ranked retrieval, and the
  * inverted-index build — the batch side of a search/retrieval pipeline
  * over training data.
  *
  * Scale architecture: everything is explode → groupBy — partial
  * aggregation halves the token shuffle, and the per-term statistics
  * (document frequency) join back on the term key, so the corpus
  * shuffles by (doc, term) once and by term once, both linear in token
  * count. The global scalars (corpus size, average doc length) are
  * single-row aggregates broadcast to every executor — never a
  * recompute-per-row subquery.
  */
object Search {

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))

  /** Top-k TF-IDF terms per document: tf·ln(N/df), deterministic
    * tie-break on the rounded score then term. */
  def tfIdfTopK(docs: DataFrame, k: Int = 3): DataFrame = {
    val tf = tokens(docs).groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfq, "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("tfidf"))
  }

  /** BM25 (k1=1.2, b=0.75) top-n retrieval for a bag of query terms.
    * Tokens are pre-filtered to the query vocabulary before the tf
    * aggregation — the shuffle carries only matching terms, which at
    * 100 TB is the difference between scanning and indexing. */
  def bm25TopN(docs: DataFrame, queryTerms: Seq[String], n: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = tokens(docs)
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val avgdl = dl.agg(avg(col("dl").cast("double")).as("avgdl"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = tok.filter(col("term").isInCollection(queryTerms))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl"))
    tf.join(dfq, "term").join(dl, "doc_id")
      .crossJoin(broadcast(avgdl)).crossJoin(broadcast(nDocs))
      .groupBy(col("doc_id"))
      .agg(round(sum(idf * col("tf") * (k1 + 1) / norm), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(n)
  }

  /** Inverted index: term → document frequency + sorted posting sample.
    * The sample is pruned BEFORE any per-term collection: a rank window
    * over distinct (term, doc) pairs gets Spark's WindowGroupLimit
    * map-side prune, so no aggregation buffer ever holds more than
    * `sampleSize` postings — collecting all of a stop-word's postings
    * and slicing afterwards would be an O(df) hot-key buffer. */
  def invertedIndex(docs: DataFrame, sampleSize: Int = 5): DataFrame = {
    val td = tokens(docs).groupBy(col("term"), col("doc_id")).agg(count(lit(1)))
      .select(col("term"), col("doc_id"))
    val dfq = td.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("term")).orderBy(col("doc_id").asc)
    val sample = td.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= sampleSize)
      .groupBy(col("term"))
      .agg(concat_ws(",", sort_array(collect_list(col("doc_id"))))
        .as("sample_postings"))
    dfq.join(sample, "term")
  }

  /** Hybrid retrieval via reciprocal-rank fusion (round 10): for each
    * probe document, fuse a LEXICAL ranking (query-by-example BM25 over
    * the probe's own distinct terms) with a DENSE ranking (cosine over
    * the embedding table) by RRF score Σ 1/(60 + rank) — the standard
    * two-tower + keyword ensemble every retrieval pipeline ships.
    *
    * Scale architecture: the lexical side pre-filters corpus tokens to
    * the probe vocabulary BEFORE the tf aggregation (the bm25TopN
    * discipline) and additionally drops terms with df ≥ 10% of the
    * corpus — the stopword guard that keeps the (probe-term × posting)
    * join linear in the posting lists actually worth ranking, exactly
    * an inverted index probe. The dense side here is the exact brute
    * baseline on the fixed probe set (linear in corpus per probe);
    * at scale the candidate generator swaps for the LSH bucket join
    * (`q_ann_lsh`) without touching the fusion. Both rank lists are
    * top-k per probe (WindowGroupLimit prunes map-side), the fusion is
    * a tiny (probes × 2k) full outer equi-join, and scores round
    * BEFORE ranking so the order replays bit-exact in the oracle. */
  def rrfFusion(docs: DataFrame, emb: DataFrame, k: Int = 20,
                kRrf: Int = 60, topN: Int = 10): DataFrame = {
    val probeFilter = col("doc_id") % 100 === 0
    // --- lexical: query-by-example BM25, probe terms as the query bag
    val tok = tokens(docs)
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val avgdl = dl.agg(avg(col("dl").cast("double")).as("avgdl"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val ptok = tokens(docs.filter(probeFilter))
      .select(col("doc_id").as("p_id"), col("term")).distinct()
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * col("dl") / col("avgdl"))
    val lexScores = tf
      .join(dfq, "term")
      .crossJoin(broadcast(nDocs))
      // stopword guard: a term in ≥10% of documents joins every one of
      // them per probe — integer-exact threshold, replayed in the oracle
      .filter(col("df") * 10 < col("n_docs"))
      .join(ptok, "term")
      .filter(col("doc_id") =!= col("p_id"))
      .join(dl, "doc_id")
      .crossJoin(broadcast(avgdl))
      .groupBy(col("p_id"), col("doc_id"))
      .agg(round(sum(idf * col("tf") * 2.2 / norm), 4).as("lex"))
    val wLex = Window.partitionBy(col("p_id"))
      .orderBy(col("lex").desc, col("doc_id").asc)
    val lexRank = lexScores.withColumn("lrank", row_number().over(wLex))
      .filter(col("lrank") <= k).select(col("p_id"), col("doc_id"), col("lrank"))
    // --- dense: exact cosine top-k on the same probe ids
    val dense = Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") % 100 === 0), k = k)
      .select(col("probe_id").as("p_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("drank"))
    // --- fuse: RRF over the union of both candidate lists
    val fused = lexRank.join(dense, Seq("p_id", "doc_id"), "full_outer")
      .select(col("p_id"), col("doc_id"),
        round(
          when(col("lrank").isNotNull, lit(1.0) / (lit(kRrf) + col("lrank")))
            .otherwise(0.0) +
          when(col("drank").isNotNull, lit(1.0) / (lit(kRrf) + col("drank")))
            .otherwise(0.0), 6).as("rrf"))
    val wF = Window.partitionBy(col("p_id"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(wF))
      .filter(col("rank") <= topN)
      .select(col("p_id").as("probe_id"), col("doc_id"),
        col("rrf"), col("rank"))
  }

  // ---- driver-verifiable entries ------------------------------------

  def entries: Map[String, Q] = Map(
    "q_tfidf" -> Q(
      (s, d) => tfIdfTopK(Tables.documents(s, d), k = 3),
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
        |), dfq AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |    round(tf.tf * ln(n_docs::DOUBLE / df), 4) AS tfidf
        |  FROM tf JOIN dfq USING (term) CROSS JOIN n
        |)
        |SELECT doc_id, term, tf, tfidf FROM scored
        |QUALIFY row_number() OVER (PARTITION BY doc_id
        |  ORDER BY tfidf DESC, term) <= 3""".stripMargin),

    "q_bm25" -> Q(
      (s, d) => bm25TopN(Tables.documents(s, d), Seq("spark", "data", "query")),
      """WITH q AS (SELECT unnest(['spark','data','query']) AS term),
        |tok AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents
        |), dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        |avgdl AS (SELECT avg(dl::DOUBLE) AS avgdl FROM dl),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |tf AS (
        |  SELECT tok.doc_id, tok.term, count(*) AS tf
        |  FROM tok JOIN q USING (term) GROUP BY 1, 2
        |), dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
        |SELECT tf.doc_id,
        |  round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
        |    * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
        |FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id)
        |CROSS JOIN avgdl CROSS JOIN n
        |GROUP BY tf.doc_id
        |ORDER BY bm25 DESC, tf.doc_id LIMIT 20""".stripMargin),

    "q_rrf_fusion" -> Q(
      (s, d) => rrfFusion(Tables.documents(s, d), Tables.embeddings(s, d)),
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents
        |), dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        |avgdl AS (SELECT avg(dl::DOUBLE) AS avgdl FROM dl),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |ptok AS (SELECT DISTINCT doc_id AS p_id, term FROM tok
        |         WHERE doc_id % 100 = 0),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |lex AS (
        |  SELECT p_id, tf.doc_id,
        |    round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
        |      * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4)
        |      AS lex
        |  FROM tf JOIN dfq USING (term) CROSS JOIN n
        |  JOIN ptok USING (term) JOIN dl ON tf.doc_id = dl.doc_id
        |  CROSS JOIN avgdl
        |  WHERE df * 10 < n_docs AND tf.doc_id <> p_id
        |  GROUP BY 1, 2
        |), lrank AS (
        |  SELECT p_id, doc_id, CAST(row_number() OVER (PARTITION BY p_id
        |    ORDER BY lex DESC, doc_id) AS INT) AS lrank
        |  FROM lex QUALIFY lrank <= 20
        |), e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (SELECT * FROM e WHERE vec_id % 100 = 0),
        |drank AS (
        |  SELECT p.vec_id AS p_id, c.vec_id AS doc_id,
        |    CAST(row_number() OVER (PARTITION BY p.vec_id
        |      ORDER BY list_cosine_similarity(p.v, c.v) DESC, c.vec_id)
        |      AS INT) AS drank
        |  FROM p JOIN e c ON p.vec_id <> c.vec_id
        |  QUALIFY drank <= 20
        |), fused AS (
        |  SELECT coalesce(l.p_id, d.p_id) AS probe_id,
        |    coalesce(l.doc_id, d.doc_id) AS doc_id,
        |    round(coalesce(1.0 / (60 + lrank), 0)
        |        + coalesce(1.0 / (60 + drank), 0), 6) AS rrf
        |  FROM lrank l FULL OUTER JOIN drank d
        |    ON l.p_id = d.p_id AND l.doc_id = d.doc_id
        |)
        |SELECT probe_id, doc_id, rrf,
        |  CAST(row_number() OVER (PARTITION BY probe_id
        |    ORDER BY rrf DESC, doc_id) AS INT) AS rank
        |FROM fused QUALIFY rank <= 10""".stripMargin),

    "q_inverted_index" -> Q(
      (s, d) => invertedIndex(Tables.documents(s, d)),
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents
        |)
        |SELECT term, count(DISTINCT doc_id) AS df,
        |  array_to_string(list_sort(list(DISTINCT doc_id))[1:5], ',')
        |    AS sample_postings
        |FROM tok GROUP BY term""".stripMargin)
  )
}
