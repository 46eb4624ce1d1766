package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Rounding.round // engine-identical rounding — shadows functions.round (see Rounding)

/** Text analysis for training-data curation (SURVEY.md §2.10): language
  * ID, quality scoring, token counting, fingerprinting. All per-row
  * Column projections — embarrassingly parallel, no shuffle at any scale.
  */
object TextAnalysis {

  private val enMarkers = Seq("the", "a", "of", "and", "to")
  private val esMarkers = Seq("el", "la", "de", "y", "que")
  private val frMarkers = Seq("le", "les", "des", "et", "une")

  private def markerScore(ws: org.apache.spark.sql.Column, markers: Seq[String]) =
    size(filter(ws, w => w.isInCollection(markers)))

  /** The composite quality score, shared by qualityScores / curate /
    * qualityBand (and mirrored by each SQL oracle). Floor-truncated to
    * 4 decimals: both engines compute the same double, and floor is
    * unambiguous at .5 boundaries where their round() differ. */
  private def qualityExpr(nWords: org.apache.spark.sql.Column,
                          punctRatio: org.apache.spark.sql.Column,
                          stopRatio: org.apache.spark.sql.Column) =
    floor((least(nWords.cast("double") / 100, lit(1.0)) * 0.5
      + (lit(1.0) - least(punctRatio * 10, lit(1.0))) * 0.25
      + least(stopRatio * 5, lit(1.0)) * 0.25) * 10000) / 10000

  /** Marker-word language ID (deterministic, SQL-replayable). */
  def languageId(docs: DataFrame): DataFrame = {
    val ws = words(col("text"))
    docs.select(col("doc_id"),
      markerScore(ws, enMarkers).as("score_en"),
      markerScore(ws, esMarkers).as("score_es"),
      markerScore(ws, frMarkers).as("score_fr"))
      .withColumn("pred_lang",
        when(col("score_en") >= col("score_es") && col("score_en") >= col("score_fr"), "en")
          .when(col("score_es") >= col("score_fr"), "es")
          .otherwise("fr"))
  }

  /** Heuristic quality scores: length, word stats, punctuation/digit/
    * stopword ratios, and a composite score. */
  def qualityScores(docs: DataFrame): DataFrame = {
    val t = col("text")
    val nChars = length(t)
    val nWords = size(words(t))
    val punct = length(regexp_replace(t, "[^.!?,;:]", ""))
    val digits = length(regexp_replace(t, "[^0-9]", ""))
    val stop = markerScore(words(t), enMarkers)
    docs.select(col("doc_id"),
      nChars.as("n_chars"), nWords.as("n_words"),
      round(length(regexp_replace(t, " ", "")).cast("double") / nWords, 4).as("avg_word_len"),
      // nullif guard: empty text has n_chars = 0 — the ratio is NULL,
      // matching DuckDB's x / 0 → NULL, never an ANSI abort (n_words
      // needs no guard: split('', ' ') = [''] so it is always >= 1)
      round(punct.cast("double") / nullif(nChars, lit(0)), 4).as("punct_ratio"),
      round(digits.cast("double") / nullif(nChars, lit(0)), 4).as("digit_ratio"),
      round(stop.cast("double") / nWords, 4).as("stopword_ratio"))
      .withColumn("quality",
        qualityExpr(col("n_words"), col("punct_ratio"), col("stopword_ratio")))
  }

  /** Token counts: whitespace, BPE-ish regex pieces, chars/4 estimate. */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val t = col("text")
    docs.select(col("doc_id"),
      size(words(t)).as("ws_tokens"),
      size(regexp_extract_all(t, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("re_tokens"),
      ceil(length(t) / lit(4.0)).cast("long").as("est_bpe_tokens"))
  }

  /** Content fingerprints over normalized text: full md5 + a 60-bit
    * numeric prefix (join-key-friendly). */
  def fingerprints(docs: DataFrame): DataFrame = {
    val norm = normalizeText(col("text"))
    docs.select(col("doc_id"),
      md5(norm).as("fp_md5"),
      conv(substring(md5(norm), 1, 15), 16, 10).cast("long").as("fp_prefix60"))
  }

  /** Composite curation pipeline: fingerprint-dedup the corpus, keep the
    * canonical doc per fingerprint, attach quality + token stats, and
    * filter to training-worthy docs. The full LLM-data flow in one
    * declarative plan — dedup groupBy and metric projections fuse into
    * two shuffle stages regardless of corpus size.
    */
  def curate(docs: DataFrame, minQuality: Double = 0.3): DataFrame = {
    val keep = fingerprints(docs)
      .groupBy(col("fp_md5")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    // quality + token metrics fused into ONE pass over the corpus (they
    // are all projections of the same row) — at 100 TB the second scan
    // and second join were pure waste
    val t = col("text")
    val nWords = size(words(t))
    val punct = length(regexp_replace(t, "[^.!?,;:]", ""))
    val stop = markerScore(words(t), enMarkers)
    val punctRatio = round(punct.cast("double") / nullif(length(t), lit(0)), 4)
    val stopRatio = round(stop.cast("double") / nWords, 4)
    val metrics = docs.select(col("doc_id"),
      nWords.as("n_words"),
      qualityExpr(nWords, punctRatio, stopRatio).as("quality"),
      nWords.as("ws_tokens"),
      ceil(length(t) / lit(4.0)).cast("long").as("est_bpe_tokens"))
    keep.join(metrics, "doc_id")
      .filter(col("quality") >= minQuality)
      .select(col("doc_id"), col("n_words"), col("quality"),
        col("ws_tokens"), col("est_bpe_tokens"))
  }

  /** PII redaction: emails, long digit runs (phone/ids), and @handles
    * masked in place — pure regexp projection, no shuffle at any scale. */
  def redactPii(docs: DataFrame): DataFrame = {
    val t = col("text")
    docs.select(col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+", "<EMAIL>"),
          "[0-9]{7,}", "<NUM>"),
        "@[a-zA-Z0-9_]+", "<HANDLE>").as("redacted"))
  }

  /** Span-level dedup removal (Lee et al. "Deduplicating Training Data
    * Makes Language Models Better" — the removal half; q_span_dedup is
    * the detection half): every repeated 20-word span keeps its
    * corpus-wide first occurrence (min (doc_id, start) — deterministic
    * on any partitioning), all other occurrences become removal
    * intervals, overlapping/adjacent intervals merge per doc (the
    * shifted windows of one duplicated region collapse to one island),
    * and the doc is rewritten without the removed words.
    *
    * Scale shape: the gram stream carries (doc_id, start, xxhash64) —
    * 8-byte keys, text never shuffles. First-occurrence election is a
    * groupBy(hash).agg(min(struct)) — partially aggregated map-side, so
    * a boilerplate span with millions of copies combines before the
    * exchange (a row_number window would put every copy in one task).
    * Interval merge is a per-doc window (bounded by doc length); the
    * rewrite joins intervals back by doc_id and filters the pre-split
    * word array with one HOF pass. */
  def spanStrip(docs: DataFrame, spanWords: Int = 20): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"),
      split(col("text"), " ").as("w"))
    val grams = base
      .filter(size(col("w")) >= spanWords)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, size(w) - ${spanWords - 1}),
           |  i -> xxhash64(slice(w, i, $spanWords)))""".stripMargin))
        .as(Seq("pos", "h")))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("s"), col("h"))
      // two consumers (election + verdict join) — one explode+hash pass
      .localCheckpoint(true)
    val firsts = grams.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("s"))).as("f"),
        count(lit(1)).as("n"))
      .filter(col("n") > 1)
    val removals = grams.join(firsts, "h")
      .filter(!(col("doc_id") === col("f.doc_id") && col("s") === col("f.s")))
      .select(col("doc_id"), col("s"),
        (col("s") + spanWords - 1).cast("int").as("e"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val prevMax = max(col("e"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val islands = removals
      .withColumn("ni",
        when(prevMax.isNull || col("s") > prevMax + 1, 1).otherwise(0))
      .withColumn("island", sum(col("ni"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("iv"))
    base.join(islands, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("iv").isNull, col("text")).otherwise(array_join(expr(
          """transform(
            |  filter(transform(w, (wd, i) -> struct(wd AS wd, i + 1 AS p)),
            |         x -> NOT exists(iv, r -> x.p >= r.s AND x.p <= r.e)),
            |  x -> x.wd)""".stripMargin), " ")).as("clean_text"),
        coalesce(expr("aggregate(iv, 0, (acc, r) -> acc + r.e - r.s + 1)"),
          lit(0)).cast("int").as("n_removed"))
  }

  /** CCNet/C4-style boilerplate removal by DOCUMENT FREQUENCY: split
    * each doc into consecutive `segWords`-word segments, count how many
    * DISTINCT docs each segment occurs in, and delete every occurrence
    * of any segment reaching `minDf` docs (headers, footers, nav bars,
    * license blurbs — text shared across documents is boilerplate, not
    * content). Differs from spanStrip (keep-first, pairwise-repeat
    * driven) in both trigger (cross-doc df threshold) and action
    * (remove ALL copies): the two are the complementary halves real
    * curation pipelines run.
    *
    * Scale shape: segments reduce to xxhash64 keys before any shuffle —
    * the df count and the boilerplate anti-join both move 8-byte
    * hashes, never segment text (text re-joins only per-doc for the
    * rewrite); the df aggregate partial-combines map-side, so a
    * million-copy footer costs one row per task, and reassembly is one
    * per-doc groupBy with an in-group sort bounded by doc length. */
  def boilerplateStrip(docs: DataFrame, segWords: Int = 8,
                       minDf: Int = 2): DataFrame = {
    val segs = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("seg_id", expr(s"pos DIV $segWords"))
      .groupBy(col("doc_id"), col("seg_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("seg"))
      .withColumn("h", xxhash64(col("seg")))
    val boiler = segs.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
    segs.join(boiler, Seq("h"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("seg_id"), col("seg")))),
            x => x.getField("seg")), " ").as("cleaned"))
  }

  /** Deterministic hash-based stratified sampling: keep a per-stratum
    * rate using a stable hash of the id — reproducible across runs,
    * engines and cluster sizes (no RNG state), the standard way to cut
    * reproducible training subsets at 100 TB. */
  def sampleStratified(docs: DataFrame, rates: Map[String, Int],
                       defaultPct: Int = 20): DataFrame = {
    val bucket = pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(100))
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (lang, p)) =>
      when(col("lang") === lang, p).otherwise(acc)
    }
    docs.filter(bucket < pct).select(col("doc_id"), col("lang"))
  }

  /** Exact greedy sequence packing: assign docs (in doc_id order) to
    * packs of at most `budget` tokens; a doc larger than the budget gets
    * its own pack. Packing is inherently sequential, so parallelism
    * comes from bucketing: docs are hash-bucketed, each bucket packs
    * independently inside one partition (mapPartitions after
    * repartition+sort) — at 100 TB every executor packs its buckets with
    * zero coordination, and pack ids are namespaced by bucket.
    */
  /** Overlapping context-window chunking: each doc splits into
    * `chunk`-word windows advancing by (chunk - overlap) words — the
    * prep step ahead of packSequences. A doc shorter than one window
    * yields exactly one (short) chunk. Pure projection of the corpus
    * scan: words → chunk-start sequence → slice/concat → posexplode,
    * no shuffle at any scale.
    */
  def chunkDocs(docs: DataFrame, chunk: Int, overlap: Int): DataFrame = {
    require(chunk > overlap && overlap >= 0,
      s"need chunk > overlap >= 0, got chunk=$chunk overlap=$overlap")
    val step = chunk - overlap
    // w projected before the lambda: interpreted HOFs re-evaluate an
    // inline split(text) per chunk — O(words·chunks) per doc otherwise
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
      posexplode(expr(
        s"""transform(sequence(0, cast(greatest(1,
           |  ceil((size(w) - $overlap) / ${step}.0)) as int) - 1,
           |  1),
           |  i -> concat_ws(' ', slice(w, i * $step + 1, $chunk)))"""
          .stripMargin)).as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_tokens", size(split(col("chunk_text"), " ")).cast("int"))
  }

  /** BPE vocabulary induction (Sennrich et al. 2016): iteratively merge
    * the most frequent adjacent symbol pair. The scale trick is the
    * WORD HISTOGRAM: one corpus-sized shuffle builds (word, freq), and
    * every merge iteration then works on the vocab-bounded histogram —
    * pair counts are sums of word freqs, so iterations cost
    * O(vocab·word_len) regardless of corpus size, and the histogram is
    * ≤ vocabWords rows by construction, so the rounds run driver-local
    * (a Spark job per round would pay the scheduling floor `merges`
    * times for kilobytes of data). Ties break (count desc, left asc,
    * right asc); merges apply leftmost-non-overlapping. Returns
    * (rank, left, right) merge rules in order.
    */
  def bpeTrain(docs: DataFrame, merges: Int,
               vocabWords: Int = 5000): Seq[(Int, String, String)] = {
    // ONE corpus-sized shuffle builds the word histogram; every merge
    // round then works on the vocab-bounded table (≤ vocabWords rows by
    // construction), which fits on the driver by definition — running
    // the rounds as Spark jobs would pay the scheduler/planning floor
    // `merges` times to process a few thousand rows (measured 7.8 s →
    // 0.4 s at sf0.1 for 20 merges). Semantics are unchanged: pair
    // counts sum word freqs over EVERY adjacent occurrence, ties break
    // (count desc, left asc, right asc), merges apply leftmost-
    // non-overlapping — the exact-merge-sequence spec pins all three.
    val hist: Array[(Array[String], Long)] = docs
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(vocabWords)
      .collect()
      .map(r => (r.getString(0).split("").filter(_.nonEmpty), r.getLong(1)))
    var seg = hist
    val rules = Seq.newBuilder[(Int, String, String)]
    var rank = 0
    var exhausted = false
    while (rank < merges && !exhausted) {
      val counts = collection.mutable.HashMap.empty[(String, String), Long]
      for ((sym, freq) <- seg; j <- 1 until sym.length)
        counts.updateWith((sym(j - 1), sym(j)))(c => Some(c.getOrElse(0L) + freq))
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), _) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        rank += 1
        rules += ((rank, a, b))
        seg = seg.map { case (sym, freq) =>
          val acc = collection.mutable.ArrayBuffer.empty[String]
          for (s <- sym) {
            if (acc.nonEmpty && acc.last == a && s == b)
              acc(acc.length - 1) = a + b
            else acc += s
          }
          (acc.toArray, freq)
        }
      }
    }
    rules.result()
  }

  /** Apply trained BPE merges: each word in `wordCol` gains an `encoded`
    * column — its segmentation under the rules, pieces space-separated.
    * The rules bake into the plan as a rank-ordered chain of
    * boundary-anchored regexp_replace passes over the char-separated
    * symbol string: one codegen'd projection per row, no per-row loop
    * state, no shuffle at any corpus size. Left-to-right non-overlapping
    * regex replacement reproduces the trainer's leftmost-first merge
    * semantics ("a a a" + rule a+a → "aa a", never "a aa").
    */
  def bpeEncode(words: DataFrame, rules: Seq[(Int, String, String)],
                wordCol: String = "word"): DataFrame = {
    rules.foreach { case (_, l, r) =>
      require((l + r).forall(c => c >= 'a' && c <= 'z'),
        s"BPE symbols must be [a-z]+ (trainer tokenizes on [^a-z]+), got '$l'+'$r'") }
    // split on "" can emit a trailing "" under Java's limit=-1 split —
    // drop empties so the symbol string has no dangling separator
    val sym0 = concat_ws(" ",
      filter(split(lower(col(wordCol)), ""), x => length(x) > 0))
    val encoded = rules.sortBy(_._1).foldLeft(sym0) { case (c, (_, l, r)) =>
      regexp_replace(c, s"(?<=^| )$l $r(?= |$$)", l + r)
    }
    words.withColumn("encoded", encoded)
  }

  /** Fixed-weight logistic quality head over cheap per-doc features —
    * the fasttext-style keep/drop classifier stand-in. Pure projection
    * (no shuffle at any corpus size), so it runs unchanged on batch and
    * streaming frames; parity is spec'd in StreamingSpec. */
  def qualityLogit(docs: DataFrame): DataFrame = {
    val w = col("w")
    val nw = size(w).cast("double")
    val awl = length(regexp_replace(col("text"), " ", "")).cast("double") / nw
    val stop = size(filter(w, x =>
      x.isInCollection(Seq("the", "a", "of", "and", "to")))).cast("double") / nw
    val dup = lit(1.0) - size(array_distinct(w)).cast("double") / nw
    val z = lit(-2.0) + lit(0.8) * log(nw) + lit(-0.5) * awl +
      lit(6.0) * stop + lit(-4.0) * dup
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    docs.withColumn("w", split(col("text"), " "))
      .select(col("doc_id"), round(p, 4).as("quality_p"),
        (p >= 0.5).as("keep"))
  }

  def packSequences(docs: DataFrame, budget: Long, buckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val withTokens = docs.select(col("doc_id"),
      size(words(col("text"))).cast("long").as("tokens"),
      pmod(col("doc_id"), lit(buckets)).cast("int").as("bucket"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("tokens", LongType),
      StructField("bucket", IntegerType), StructField("pack_id", LongType)))
    val packed = withTokens
      .repartition(buckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("doc_id"))
      .rdd.mapPartitions { it =>
        var curBucket = -1
        var packInBucket = 0L
        var used = 0L
        it.map { r =>
          val b = r.getAs[Int]("bucket")
          val t = r.getAs[Long]("tokens")
          if (b != curBucket) { curBucket = b; packInBucket = 0L; used = 0L }
          if (used + t > budget && used > 0) { packInBucket += 1; used = 0L }
          used += t
          // 40-bit pack space per bucket: a collision would need 2^40
          // packs in ONE bucket (~10^12 — beyond any corpus/bucket combo)
          Row(r.getAs[Long]("doc_id"), t, b, (b.toLong << 40) + packInBucket)
        }
      }
    docs.sparkSession.createDataFrame(packed, schema)
  }

  /** Benchmark-contamination detection: sliding word 8-grams of every
    * doc, hashed; training docs sharing grams with the benchmark split
    * are flagged with the overlap count. Both sides shuffle once on the
    * gram hash — the join carries (hash, doc_id) only, linear in corpus
    * size, the standard decontamination shape for training corpora.
    */
  def contamination(docs: DataFrame, benchMod: Int = 10,
                    gramWords: Int = 8): DataFrame = {
    // w is projected before the lambda (HOFs are interpreted and
    // re-evaluate their subtree per element — an inline split(text)
    // would be O(words²) per doc); grams are keyed by xxhash64 over the
    // word-array slice, so the train⋈bench shuffle moves 8-byte longs
    // instead of digest strings. The hash never reaches the output —
    // each engine's own hash only has to be injective on its grams.
    val grams = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), greatest(size(col("w")) - (gramWords - 2), lit(2)) - 1),
          i => xxhash64(slice(col("w"), i, lit(gramWords)))))).as("gh"))
    val bench = grams.filter(col("doc_id") % benchMod === 0)
      .select(col("doc_id").as("bench_id"), col("gh"))
    val train = grams.filter(col("doc_id") % benchMod =!= 0)
      .select(col("doc_id").as("train_id"), col("gh"))
    train.join(bench, "gh")
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Domain-mixture statistics: per (lang, source) doc/token counts,
    * token share of the corpus, and an inverse-sqrt upweight — the
    * inputs to temperature-based mixture sampling. One groupBy plus a
    * broadcast single-row total. */
  def domainMix(docs: DataFrame): DataFrame = {
    val t = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(words(col("text")))).cast("long").as("n_tokens"))
    val tot = t.agg(sum(col("n_tokens")).as("total_tokens"))
    t.crossJoin(broadcast(tot))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("total_tokens"), 6).as("token_share"),
        round(lit(1.0) / sqrt(col("n_tokens") / col("total_tokens")), 4)
          .as("upweight"))
  }

  /** Temperature-scaled mixture sampling (round 10): keep-rate per
    * (lang, source) group is (n_min/n_g)^(1 − 1/T) — the standard
    * multilingual-corpus temperature reweighting (T=1 keeps the natural
    * distribution, T→∞ approaches uniform; T=2 is the inverse-sqrt
    * sampler `mixSample` gates). The exponent is restricted to
    * T = 2^k so x^(1 − 2^-k) composes from IEEE sqrt and multiply ONLY
    * (e_k = sqrt(x · e_{k−1}), e_0 = 1) — pow/exp/ln are libm calls
    * whose last-ulp behavior differs across engines, and the keep
    * decision compares a hash against floor(rate·10⁴), so a one-ulp
    * rate difference could flip a document. Same md5 gate as mixSample:
    * reproducible on any cluster, no RNG state. */
  def temperatureSample(docs: DataFrame, log2T: Int): DataFrame = {
    require(log2T >= 1 && log2T <= 6, s"T must be 2^k, k in 1..6, got k=$log2T")
    val g = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_g"))
    val m = g.agg(min(col("n_g")).as("min_n"))
    val r = col("min_n").cast("double") / col("n_g")
    // x^(1 - 2^-k) by k sqrt-and-multiply steps
    val rate = (1 to log2T).foldLeft(lit(1.0): org.apache.spark.sql.Column) {
      case (acc, _) => sqrt(r * acc)
    }
    val rates = g.crossJoin(broadcast(m))
      .select(col("lang"), col("source"),
        floor(rate * 10000).cast("long").as("cut"))
    graft.streaming.StreamingText.mixGate(docs, rates)
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Per-language quality band filter: keep docs between the p5 and p95
    * quality percentiles of their language. percent_rank partitions by
    * lang, so the sort parallelizes across languages (a global band
    * would be one big sort — partition on the natural stratum instead).
    */
  def qualityBand(docs: DataFrame, lo: Double = 0.05,
                  hi: Double = 0.95): DataFrame = {
    val t = col("text")
    val nWords = size(words(t))
    val punct = length(regexp_replace(t, "[^.!?,;:]", ""))
    val stop = markerScore(words(t), enMarkers)
    val punctRatio = round(punct.cast("double") / nullif(length(t), lit(0)), 4)
    val stopRatio = round(stop.cast("double") / nWords, 4)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("quality"), col("doc_id"))
    docs.select(col("doc_id"), col("lang"),
      qualityExpr(nWords, punctRatio, stopRatio).as("quality"))
      // filter on the RAW rank (the contract), round only for display —
      // filtering on the rounded value would shift the band edges
      .withColumn("pct_raw", percent_rank().over(w))
      .filter(col("pct_raw") >= lo && col("pct_raw") <= hi)
      .select(col("doc_id"), col("lang"), col("quality"),
        round(col("pct_raw"), 6).as("pct"))
  }

  /** Per-document character-distribution Shannon entropy (gibberish /
    * encoding-junk detector: natural language sits ~3.5–4.5 bits,
    * base64 blobs and repeated-char padding fall far outside) plus
    * type-token ratio (lexical diversity).
    *
    * Entropy uses the identity −Σ(n/N)·log2(n/N) = log2 N − Σ n·log2 n / N
    * so the aggregation is a plain two-level hash agg: explode to
    * (doc, char) rows — linear, and the map-side partial combine
    * collapses each partition to ≤|alphabet| rows per doc before any
    * shuffle — then one sum per doc. All-positive terms: no
    * cancellation, so hash-agg ordering stays inside the oracle's
    * float tolerance (the q_embed_project ±x lesson does not apply).
    * TTR is a pure per-row projection and joins back on doc_id.
    */
  def charEntropy(docs: DataFrame): DataFrame = {
    // empty docs are excluded EXPLICITLY on both engines: Spark's
    // split('', '') yields [""] (the doc would survive with entropy 0)
    // while DuckDB's string_split('', '') yields [] (the unnest drops
    // it) — without the shared filter the two engines disagree on any
    // corpus containing an empty text.
    val d = docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"))
    val ent = d
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("tot"), sum(col("n") * log2(col("n"))).as("nlogn"))
      .select(col("doc_id"),
        round(log2(col("tot")) - col("nlogn") / col("tot"), 4).as("char_entropy"))
    val ttr = d.select(col("doc_id"),
      round(size(array_distinct(split(col("text"), " "))).cast("double") /
        size(split(col("text"), " ")), 4).as("ttr"))
    ent.join(ttr, Seq("doc_id"))
  }

  /** DSIR-style importance weights (Xie et al., NeurIPS 2023): per-doc
    * log-likelihood ratio between a TARGET-domain unigram LM and the
    * full-corpus LM — the standard data-selection score for steering a
    * pretraining mix toward a target distribution (positive ⇒ the doc
    * looks more target-like than the corpus average). Add-1 smoothing
    * over the corpus vocabulary.
    *
    * Scale: both count tables are vocabulary-sized, not corpus-sized,
    * built with map-side partial aggregation; the token stream joins
    * them on the word key as a plain shuffle join (NO broadcast
    * assumption on the vocabulary — at 100 TB it does not fit), while
    * the two one-row total frames broadcast.
    */
  def dsirWeights(docs: DataFrame, targetLang: String = "en"): DataFrame = {
    val toks = filter(split(lower(col("text")), "[^a-z]+"), t => length(t) > 0)
    val tok = docs.select(col("doc_id"), col("lang"), explode(toks).as("w"))
    val tgt = tok.filter(col("lang") === targetLang)
      .groupBy(col("w")).agg(count(lit(1)).as("tc"))
    val src = tok.groupBy(col("w")).agg(count(lit(1)).as("sc"))
    val tgtTot = tgt.agg(sum(col("tc")).as("t_total"))
    val srcTot = src.agg(sum(col("sc")).as("s_total"), count(lit(1)).as("vocab"))
    tok.join(src, Seq("w")).join(tgt, Seq("w"), "left")
      .na.fill(0L, Seq("tc"))
      .crossJoin(broadcast(tgtTot)).crossJoin(broadcast(srcTot))
      .groupBy(col("doc_id"))
      .agg(round(sum(
        log((col("tc") + 1).cast("double") / (col("t_total") + col("vocab")))
          - log((col("sc") + 1).cast("double") / (col("s_total") + col("vocab")))),
        4).as("dsir_w"),
        count(lit(1)).as("n_toks"))
  }

  // ---- driver-verifiable entries ------------------------------------

  def entries: Map[String, Q] = Map(
    // df-threshold boilerplate removal (see boilerplateStrip). The
    // oracle replays segmentation, the distinct-doc df count, and the
    // rewritten text verbatim — the whole operator hash-checks.
    "q_line_dedup" -> Q(
      (s, d) => boilerplateStrip(Tables.documents(s, d)),
      """WITH t2 AS (
        |  SELECT doc_id, generate_subscripts(ws, 1) AS ord, unnest(ws) AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |), seg AS (
        |  SELECT doc_id, (ord - 1) // 8 AS seg_id,
        |    string_agg(tok, ' ' ORDER BY ord) AS seg
        |  FROM t2 GROUP BY 1, 2
        |), bp AS (
        |  SELECT seg FROM seg GROUP BY seg
        |  HAVING count(DISTINCT doc_id) >= 2
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |  string_agg(seg, ' ' ORDER BY seg_id) AS cleaned
        |FROM seg WHERE seg NOT IN (SELECT seg FROM bp)
        |GROUP BY doc_id""".stripMargin),

    "q_dsir_weights" -> Q(
      (s, d) => dsirWeights(Tables.documents(s, d)),
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS w
        |  FROM documents
        |), tgt AS (SELECT w, count(*) AS tc FROM tok WHERE lang = 'en' GROUP BY w),
        |src AS (SELECT w, count(*) AS sc FROM tok GROUP BY w),
        |tot AS (SELECT (SELECT sum(tc) FROM tgt) AS t_total,
        |               (SELECT sum(sc) FROM src) AS s_total,
        |               (SELECT count(*) FROM src) AS vocab)
        |SELECT doc_id,
        |  round(sum(ln((coalesce(tc, 0) + 1.0) / (t_total + vocab))
        |          - ln((sc + 1.0) / (s_total + vocab))), 4) AS dsir_w,
        |  CAST(count(*) AS BIGINT) AS n_toks
        |FROM tok JOIN src USING (w) LEFT JOIN tgt USING (w) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin),

    "q_text_entropy" -> Q(
      (s, d) => charEntropy(Tables.documents(s, d)),
      """WITH nz AS (
        |  SELECT doc_id, text FROM documents WHERE length(text) > 0
        |), c AS (
        |  SELECT doc_id, ch, count(*)::DOUBLE AS n
        |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
        |        FROM nz) u
        |  GROUP BY doc_id, ch
        |), e AS (
        |  SELECT doc_id,
        |    round(log2(sum(n)) - sum(n * log2(n)) / sum(n), 4) AS char_entropy
        |  FROM c GROUP BY doc_id
        |)
        |SELECT e.doc_id, e.char_entropy,
        |  round(len(list_distinct(string_split(d.text, ' '))) * 1.0 /
        |        len(string_split(d.text, ' ')), 4) AS ttr
        |FROM e JOIN nz d ON e.doc_id = d.doc_id""".stripMargin),

    "q_contamination" -> Q(
      (s, d) => contamination(Tables.documents(s, d)),
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), c AS (
        |  SELECT doc_id, unnest(list_distinct([array_to_string(w[i:i+7], ' ')
        |    FOR i IN range(1, greatest(len(w) - 6, 2))])) AS gram
        |  FROM w
        |), h AS (SELECT doc_id, md5(gram) AS gh FROM c),
        |bench AS (SELECT doc_id AS bench_id, gh FROM h WHERE doc_id % 10 = 0),
        |train AS (SELECT doc_id AS train_id, gh FROM h WHERE doc_id % 10 <> 0)
        |SELECT train_id, bench_id, count(*) AS n_shared
        |FROM train JOIN bench USING (gh)
        |GROUP BY 1, 2""".stripMargin),

    // PSI distribution drift between corpus snapshots (population
    // stability index, the standard drift score): doc-length deciles
    // of the even-id half vs the odd-id half, per language, with
    // Laplace smoothing so empty bins stay defined. The canonical
    // "did this month's crawl shift under my feet" check before a
    // training run. One groupBy + a broadcast totals join — the
    // explicit bin grid makes absent bins identical on both engines.
    "q_psi_drift" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val counts = docs.select(col("lang"),
          least(floor(col("n_chars") / 100), lit(9)).cast("int").as("bin"),
          (col("doc_id") % 2 === 0).as("in_a"))
          .groupBy(col("lang"), col("bin")).agg(
            sum(when(col("in_a"), 1).otherwise(0)).as("na"),
            sum(when(!col("in_a"), 1).otherwise(0)).as("nb"))
        val grid = docs.select(col("lang")).distinct()
          .select(col("lang"), explode(expr("sequence(0, 9)")).as("bin"))
        val full = grid.join(counts, Seq("lang", "bin"), "left")
          .na.fill(0L, Seq("na", "nb"))
        val tot = full.groupBy(col("lang")).agg(
          sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
        val pa = (col("na") + 1) / (col("ta") + lit(10.0))
        val pb = (col("nb") + 1) / (col("tb") + lit(10.0))
        full.join(broadcast(tot), "lang")
          .groupBy(col("lang"))
          .agg(round(sum((pa - pb) * log(pa / pb)), 4).as("psi"))
      },
      """WITH b AS (
        |  SELECT lang, least(CAST(floor(n_chars / 100) AS INT), 9) AS bin,
        |    doc_id % 2 = 0 AS in_a
        |  FROM documents
        |), c AS (
        |  SELECT lang, bin,
        |    sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS nb
        |  FROM b GROUP BY 1, 2
        |), grid AS (
        |  SELECT lang, CAST(i AS INT) AS bin
        |  FROM (SELECT DISTINCT lang FROM documents),
        |    (SELECT unnest(range(10)) AS i)
        |), f AS (
        |  SELECT grid.lang, grid.bin,
        |    coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
        |  FROM grid LEFT JOIN c ON grid.lang = c.lang AND grid.bin = c.bin
        |), t AS (
        |  SELECT lang, sum(na) AS ta, sum(nb) AS tb FROM f GROUP BY 1
        |)
        |SELECT f.lang,
        |  round(sum(((na + 1) / (ta + 10.0) - (nb + 1) / (tb + 10.0))
        |    * ln(((na + 1) / (ta + 10.0)) / ((nb + 1) / (tb + 10.0)))), 4) AS psi
        |FROM f JOIN t ON f.lang = t.lang
        |GROUP BY f.lang""".stripMargin),

    "q_domain_mix" -> Q(
      (s, d) => domainMix(Tables.documents(s, d)),
      """WITH t AS (
        |  SELECT lang, source, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1, 2
        |), tot AS (SELECT sum(n_tokens) AS total_tokens FROM t)
        |SELECT lang, source, n_docs, n_tokens,
        |  round(n_tokens / total_tokens, 6) AS token_share,
        |  round(1.0 / sqrt(n_tokens / total_tokens), 4) AS upweight
        |FROM t CROSS JOIN tot""".stripMargin),

    // weighted data-mixing sampler: the executable form of the
    // domain-mix upweights. Per-(lang, source) keep-rate is
    // sqrt(min_n / n_g) — inverse-sqrt flattening where the rarest
    // group keeps 100% — and the keep decision is the md5 hash gate
    // (reproducible on any cluster, no RNG state; the same doc set
    // survives a re-run or a backfill). The rate table is tiny →
    // broadcast; the corpus scan never shuffles.
    "q_mix_sample" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val g = docs.groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_g"))
        val m = g.agg(min(col("n_g")).as("min_n"))
        val rates = g.crossJoin(broadcast(m))
          .withColumn("cut",
            floor(sqrt(col("min_n").cast("double") / col("n_g")) * 10000)
              .cast("long"))
          .select(col("lang"), col("source"), col("cut"))
        graft.streaming.StreamingText.mixGate(docs, rates)
          .select(col("doc_id"), col("lang"), col("source"))
      },
      """WITH g AS (
        |  SELECT lang, source, count(*) AS n_g FROM documents GROUP BY 1, 2
        |), m AS (SELECT min(n_g) AS min_n FROM g),
        |r AS (
        |  SELECT lang, source,
        |    CAST(floor(sqrt(CAST(min_n AS DOUBLE) / n_g) * 10000) AS BIGINT)
        |      AS cut
        |  FROM g CROSS JOIN m
        |)
        |SELECT doc_id, d.lang, d.source
        |FROM documents d JOIN r USING (lang, source)
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |  % 10000 < cut""".stripMargin),

    // temperature-scaled mixture sampler at T=4 (exponent 3/4 composed
    // from sqrt·multiply only — see temperatureSample for why pow is
    // banned): flatter than mixSample's T=2, same md5 gate, full
    // oracle replaying the sqrt(r·sqrt(r)) rate and the hash decision
    "q_mix_temperature" -> Q(
      (s, d) => temperatureSample(Tables.documents(s, d), log2T = 2),
      """WITH g AS (
        |  SELECT lang, source, count(*) AS n_g FROM documents GROUP BY 1, 2
        |), m AS (SELECT min(n_g) AS min_n FROM g),
        |r AS (
        |  SELECT lang, source,
        |    CAST(floor(sqrt((CAST(min_n AS DOUBLE) / n_g) *
        |      sqrt((CAST(min_n AS DOUBLE) / n_g) * 1.0)) * 10000) AS BIGINT)
        |      AS cut
        |  FROM g CROSS JOIN m
        |)
        |SELECT doc_id, d.lang, d.source
        |FROM documents d JOIN r USING (lang, source)
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |  % 10000 < cut""".stripMargin),

    // training-window chunking: split each doc into fixed-token chunks
    // with overlap (the context-window prep step every training
    // pipeline runs before packing). Pure Column algebra — words →
    // chunk-start sequence → slice/concat per chunk → posexplode; no
    // shuffle at all, the op is a projection of the corpus scan.
    "q_chunk_docs" -> Q(
      (s, d) => chunkDocs(Tables.documents(s, d), chunk = 64, overlap = 8),
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), c AS (
        |  SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |    array_to_string(w[(i*56+1):(i*56+64)], ' ') AS chunk_text
        |  FROM t, LATERAL (SELECT unnest(generate_series(0,
        |    CAST(greatest(1, ceil((len(w) - 8) / 56.0)) AS BIGINT) - 1)) AS i)
        |)
        |SELECT doc_id, chunk_idx, chunk_text,
        |  CAST(len(string_split(chunk_text, ' ')) AS INT) AS n_tokens
        |FROM c""".stripMargin),

    // n-gram novelty: the fraction of a doc's sliding 5-grams that are
    // unique corpus-wide — low novelty flags templated/boilerplate
    // docs that per-doc quality scores miss. NO gram-table self-join
    // (the round-6 shape joined the 1.5M-row gram frame back onto its
    // own frequency table): a gram with corpus count 1 occurs in
    // EXACTLY one document, so min(doc_id) inside the frequency
    // aggregate already names the doc its novelty credit belongs to —
    // one groupBy(g) with map-side combine replaces the join, and the
    // two doc-level roll-ups that remain are corpus-card tables.
    "q_novelty" -> Q(
      (s, d) => {
        // grams feed BOTH roll-ups — localCheckpoint so the explode+
        // hash pass runs once, not once per consumer. w is projected
        // BEFORE the lambda: higher-order functions are not codegen'd
        // and re-evaluate their subtree per element, so a split(text)
        // inside the lambda is O(words²) per doc. The gram key is
        // xxhash64 over the word-array slice — an 8-byte long through
        // the shuffle, not a 32-char digest string; the hash never
        // reaches the output, so each engine only needs its own hash to
        // be injective on the corpus grams.
        val grams = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .filter(size(col("w")) >= 5)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(w) - 4), i -> xxhash64(slice(w, i, 5)))"
          )).as("g"))
          .localCheckpoint(true)
        val totals = grams.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"))
        val uniq = grams.groupBy(col("g"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("doc_id"))
          .filter(col("n") === 1)
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_uniq"))
        totals.join(uniq, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_grams"),
            round(coalesce(col("n_uniq"), lit(0L)).cast("double")
              / col("n_grams"), 4).as("novelty"))
      },
      """WITH g AS (
        |  SELECT doc_id, md5(array_to_string(w[i:i+4], ' ')) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |     , LATERAL (SELECT unnest(generate_series(1, len(w) - 4)) AS i)
        |  WHERE len(w) >= 5
        |), f AS (SELECT g, count(*) AS n FROM g GROUP BY 1)
        |SELECT doc_id, count(*) AS n_grams,
        |  round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 4)
        |    AS novelty
        |FROM g JOIN f USING (g) GROUP BY doc_id""".stripMargin),

    // exact repeated-span detection (the prep step for span-level
    // dedup à la "Deduplicating Training Data Makes LMs Better"):
    // every 20-word span whose hash repeats corpus-wide, with its
    // 1-based word position — removal-ready output. Hashes shuffle,
    // text never does; the repeated-gram set is a broadcast-scale
    // fraction of the corpus in real data.
    "q_span_dedup" -> Q(
      (s, d) => {
        // w projected before the lambda (interpreted HOFs re-evaluate
        // an inline split per element — O(words²) per doc). The md5
        // stays: span_hash IS the output contract and must replay
        // byte-identically in DuckDB.
        val grams = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .filter(size(col("w")) >= 20)
          .select(col("doc_id"), posexplode(expr(
            """transform(sequence(1, size(w) - 19),
              |  i -> md5(concat_ws(' ', slice(w, i, 20))))"""
              .stripMargin)).as(Seq("pos", "g")))
          .select(col("doc_id"), (col("pos") + 1).as("span_start"), col("g"))
          // two consumers (frequency filter + position join) — one
          // explode+md5 pass, same rationale as q_novelty
          .localCheckpoint(true)
        val repeated = grams.groupBy(col("g"))
          .agg(count(lit(1)).as("n")).filter(col("n") > 1)
        grams.join(repeated, "g")
          .select(col("doc_id"), col("span_start").cast("int").as("span_start"),
            col("g").as("span_hash"), col("n").as("n_copies"))
      },
      """WITH g AS (
        |  SELECT doc_id, CAST(i AS INT) AS span_start,
        |    md5(array_to_string(w[i:i+19], ' ')) AS span_hash
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |     , LATERAL (SELECT unnest(generate_series(1, len(w) - 19)) AS i)
        |  WHERE len(w) >= 20
        |), r AS (
        |  SELECT span_hash, count(*) AS n_copies FROM g
        |  GROUP BY 1 HAVING count(*) > 1
        |)
        |SELECT doc_id, span_start, span_hash, n_copies
        |FROM g JOIN r USING (span_hash)""".stripMargin),

    // span-level dedup REMOVAL (closes the q_span_dedup loop): every
    // repeated 20-word span keeps its corpus-wide FIRST occurrence
    // (min (doc_id, start) — deterministic on any cluster) and every
    // other occurrence is marked, marks are merged into per-doc word
    // intervals (overlapping/adjacent spans of a duplicated region
    // collapse to one island), and the doc is rewritten without the
    // removed words. First-occurrence election is groupBy+min(struct)
    // — partial-aggregated map-side, so a boilerplate span with 10^8
    // copies combines before the shuffle instead of landing on one
    // window partition; only the 8-byte gram hash shuffles, text never
    // does. Interval merge is a per-doc window (bounded by doc length);
    // the rewrite is one HOF filter over the pre-split word array.
    "q_span_strip" -> Q(
      (s, d) => spanStrip(Tables.documents(s, d)),
      """WITH base AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
        |), g AS (
        |  SELECT doc_id, CAST(i AS INT) AS s, CAST(i + 19 AS INT) AS e,
        |    md5(array_to_string(w[i:i+19], ' ')) AS h
        |  FROM base, LATERAL (SELECT unnest(generate_series(1, len(w) - 19)) AS i)
        |  WHERE len(w) >= 20
        |), occ AS (
        |  SELECT doc_id, s, e,
        |    row_number() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn
        |  FROM g
        |), rem AS (SELECT doc_id, s, e FROM occ WHERE rn > 1
        |), isl AS (
        |  SELECT doc_id, s, e, CASE WHEN
        |      max(e) OVER (PARTITION BY doc_id ORDER BY s
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
        |    THEN 1 ELSE 0 END AS ni
        |  FROM rem
        |), merged AS (
        |  SELECT doc_id, min(s) AS s, max(e) AS e
        |  FROM (SELECT doc_id, s, e,
        |          sum(ni) OVER (PARTITION BY doc_id ORDER BY s
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |        FROM isl)
        |  GROUP BY doc_id, island
        |), kept AS (
        |  SELECT b.doc_id, p, b.w[p] AS wd
        |  FROM base b, LATERAL (SELECT unnest(generate_series(1, len(b.w))) AS p)
        |  WHERE b.doc_id IN (SELECT doc_id FROM merged)
        |    AND NOT EXISTS (SELECT 1 FROM merged m
        |      WHERE m.doc_id = b.doc_id AND p BETWEEN m.s AND m.e)
        |), rebuilt AS (
        |  SELECT doc_id, string_agg(wd, ' ' ORDER BY p) AS clean_text
        |  FROM kept GROUP BY doc_id
        |), removed AS (
        |  SELECT doc_id, CAST(sum(e - s + 1) AS INT) AS n_removed
        |  FROM merged GROUP BY doc_id
        |)
        |SELECT b.doc_id,
        |  CASE WHEN nr.doc_id IS NULL THEN b.text
        |       ELSE COALESCE(r.clean_text, '') END AS clean_text,
        |  COALESCE(nr.n_removed, 0) AS n_removed
        |FROM base b
        |LEFT JOIN rebuilt r ON b.doc_id = r.doc_id
        |LEFT JOIN removed nr ON b.doc_id = nr.doc_id""".stripMargin),

    // hashing-trick featurization: tokens hash into D buckets, count
    // per (doc, bucket) — the model-free sparse doc vector (classifier
    // features, cheap similarity) with a FIXED dimensionality and no
    // vocabulary table to build, ship, or keep consistent. Emitted as
    // (doc_id, bucket, cnt) rows — the sparse representation IS the
    // scale format (a dense array would be ~D columns of mostly zeros);
    // md5-stable bucketing makes the whole featurization replayable.
    "q_hash_features" -> Q(
      (s, d) => {
        val toks = filter(split(lower(col("text")), "[^a-z]+"), t => length(t) > 0)
        Tables.documents(s, d)
          .select(col("doc_id"), explode(toks).as("tok"))
          .withColumn("bucket",
            (conv(substring(md5(col("tok")), 1, 8), 16, 10)
              .cast("long") % 128).cast("int"))
          .groupBy(col("doc_id"), col("bucket"))
          .agg(count(lit(1)).as("cnt"))
      },
      """WITH t AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS tok
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(('0x' || substr(md5(tok), 1, 8))::BIGINT % 128 AS INT) AS bucket,
        |  count(*) AS cnt
        |FROM t GROUP BY 1, 2""".stripMargin),

    // weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES):
    // per-item key ln(u)/w with u md5-derived from doc_id — the top-k
    // keys per group are a weight-proportional sample, computed as a
    // per-group rank (WindowGroupLimit prunes map-side) with NO
    // sequential pass and no RNG state: the same doc set is selected on
    // any cluster size, any engine, any rerun. The mixing primitive for
    // "sample 5 docs per language ∝ length" — full DuckDB oracle
    // (rank depends only on key ORDER, ties impossible: md5 keys are
    // distinct reals).
    "q_weighted_sample" -> Q(
      (s, d) => {
        val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("double") + 0.5) / 4294967296.0
        val key = log(u) / col("n_chars") // maximize u^(1/w) ⇔ maximize ln(u)/w
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("k").desc, col("doc_id"))
        Tables.documents(s, d)
          .filter(col("n_chars") > 0)
          .select(col("lang"), col("doc_id"), col("n_chars"), key.as("k"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("lang"), col("rank"), col("doc_id"), col("n_chars"))
      },
      """WITH k AS (
        |  SELECT lang, doc_id, n_chars,
        |    ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        + 0.5) / 4294967296.0) / n_chars AS k
        |  FROM documents WHERE n_chars > 0
        |)
        |SELECT lang, CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY k DESC, doc_id) AS INT) AS rank,
        |  doc_id, n_chars
        |FROM k QUALIFY rank <= 5""".stripMargin),

    // differentially-private count release (Laplace mechanism) with
    // DETERMINISTIC noise: u ~ Uniform(0,1) derives from the md5 hash
    // of the group key ((h + 0.5) / 2^32 — never exactly 0 or 0.5, so
    // the inverse-CDF ln() stays finite), noise = -sign(u-.5)·ln(1-2|u-.5|)/ε.
    // No RNG state to coordinate across engines, executors, or reruns —
    // the release is reproducible AND replayable in DuckDB (full
    // oracle). The privacy-preserving stats-publication primitive for
    // corpus dashboards; one partial-aggregated count pass, noise is a
    // per-group projection.
    "q_dp_counts" -> Q(
      (s, d) => {
        val eps = 1.0
        val h = conv(substring(md5(concat_ws("_", col("lang"), col("source"))),
          1, 8), 16, 10).cast("long")
        val u = (h.cast("double") + 0.5) / 4294967296.0
        val c = u - 0.5
        val noise = -signum(c) * log(lit(1.0) - lit(2.0) * abs(c)) / eps
        Tables.documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n"))
          .select(col("lang"), col("source"),
            round(col("n") + noise, 3).as("noisy_n"))
      },
      """WITH g AS (
        |  SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2
        |), u AS (
        |  SELECT lang, source, n,
        |    (('0x' || substr(md5(lang || '_' || source), 1, 8))::BIGINT + 0.5)
        |      / 4294967296.0 - 0.5 AS c
        |  FROM g
        |)
        |SELECT lang, source,
        |  round(n + (-sign(c) * ln(1 - 2 * abs(c)) / 1.0), 3) AS noisy_n
        |FROM u""".stripMargin),

    // tokenizer-vocabulary coverage (OOV rate): fix the vocab at the
    // top-1000 corpus terms (deterministic count-desc/term tiebreak —
    // plans as TakeOrdered, a distributed top-K, never a global sort),
    // then score every document's out-of-vocabulary token fraction.
    // The pipeline primitive behind "how much of my corpus does this
    // tokenizer/vocab actually cover": vocab is tiny → broadcast LEFT
    // join marks in-vocab tokens; counts partial-aggregate per doc.
    // Integer-ratio rounding is engine-exact (same two longs divide to
    // the same double on both sides).
    "q_oov_rate" -> Q(
      (s, d) => {
        val toks = filter(split(lower(col("text")), "[^a-z]+"), t => length(t) > 0)
        val tokens = Tables.documents(s, d)
          .select(col("doc_id"), explode(toks).as("tok"))
        val vocab = tokens.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok")).limit(1000)
          .select(col("tok"), lit(1).as("iv"))
        tokens.join(broadcast(vocab), Seq("tok"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
          .withColumn("oov_rate",
            round(col("n_oov").cast("double") / col("n_tokens"), 4))
      },
      """WITH t AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS tok
        |  FROM documents
        |), vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS cnt FROM t GROUP BY 1)
        |  ORDER BY cnt DESC, tok LIMIT 1000
        |), scored AS (
        |  SELECT t.doc_id, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM t LEFT JOIN vocab v USING (tok)
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(oov) AS BIGINT) AS n_oov,
        |  round(sum(oov) * 1.0 / count(*), 4) AS oov_rate
        |FROM scored GROUP BY 1""".stripMargin),

    // deterministic train/val/test assignment: hash-range split on the
    // stable md5 gate (90/5/5). Content-addressed and RNG-free — the
    // same doc lands in the same split on every engine, cluster size,
    // and backfill; pure projection, no shuffle.
    "q_split_assign" -> Q(
      (s, d) => {
        val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 100
        Tables.documents(s, d).select(col("doc_id"),
          when(h < 90, "train").when(h < 95, "val").otherwise("test")
            .as("split"))
      },
      """SELECT doc_id,
        |  CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |          % 100 AS h
        |      FROM documents)""".stripMargin),

    "q_quality_band" -> Q(
      (s, d) => qualityBand(Tables.documents(s, d)),
      """WITH q AS (
        |  SELECT doc_id, lang,
        |    CAST(length(text) AS INT) AS n_chars,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |    CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS INT) AS punct,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> list_contains(['the','a','of','and','to'], w))) AS INT) AS stop
        |  FROM documents
        |), scored AS (
        |  SELECT doc_id, lang,
        |    floor((least(n_words::DOUBLE / 100, 1.0) * 0.5
        |      + (1.0 - least(round(punct::DOUBLE / n_chars, 4) * 10, 1.0)) * 0.25
        |      + least(round(stop::DOUBLE / n_words, 4) * 5, 1.0) * 0.25) * 10000)
        |      / 10000 AS quality
        |  FROM q
        |)
        |SELECT doc_id, lang, quality, round(pct, 6) AS pct FROM (
        |  SELECT doc_id, lang, quality,
        |    percent_rank() OVER (PARTITION BY lang
        |      ORDER BY quality, doc_id) AS pct
        |  FROM scored)
        |WHERE pct >= 0.05 AND pct <= 0.95""".stripMargin),

    // URL parsing (KSQL URL_EXTRACT_* family). Test docs carry no URLs,
    // so a deterministic URL is derived from (source, doc_id) first —
    // the extraction logic is the operator under test.
    "q_url_extract" -> Q(
      (s, d) => Tables.documents(s, d)
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".example.com/docs/"), col("doc_id"), lit("?lang="), col("lang")))
        .select(col("doc_id"),
          regexp_extract(col("url"), "^([a-z]+)://", 1).as("protocol"),
          regexp_extract(col("url"), "^[a-z]+://([^/]+)/", 1).as("host"),
          regexp_extract(col("url"), "^[a-z]+://[^/]+(/[^?]*)", 1).as("path"),
          regexp_extract(col("url"), "\\?(.*)$", 1).as("query")),
      """WITH u AS (
        |  SELECT doc_id, 'https://' || source || '.example.com/docs/' ||
        |    doc_id || '?lang=' || lang AS url
        |  FROM documents
        |)
        |SELECT doc_id,
        |  coalesce(regexp_extract(url, '^([a-z]+)://', 1), '') AS protocol,
        |  coalesce(regexp_extract(url, '^[a-z]+://([^/]+)/', 1), '') AS host,
        |  coalesce(regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1), '') AS path,
        |  coalesce(regexp_extract(url, '\?(.*)$', 1), '') AS query
        |FROM u""".stripMargin),

    // Gopher-style repetition signals: distinct-word ratio + duplicate
    // word-bigram fraction (high values flag boilerplate/spam)
    "q_text_repetition" -> Q(
      (s, d) => {
        // w projected before the lambda (interpreted HOFs re-evaluate
        // an inline split per element — O(words²) per doc otherwise).
        // slice (not w[i]) so a 1-word doc yields its one short "gram"
        // instead of an ANSI out-of-bounds error.
        val w = col("w")
        val bigrams = expr(
          """transform(sequence(1, greatest(size(w) - 1, 1)),
            |  i -> concat_ws(' ', slice(w, i, 2)))""".stripMargin)
        Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"),
          round(lit(1.0) - size(array_distinct(w)).cast("double") / size(w), 4)
            .as("dup_word_ratio"),
          round(lit(1.0) - size(array_distinct(bigrams)).cast("double")
            / size(bigrams), 4).as("dup_bigram_ratio"))
      },
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w,
        |    [array_to_string(string_split(text, ' ')[i:i+1], ' ')
        |     FOR i IN range(1, greatest(len(string_split(text, ' ')), 2))] AS bg
        |  FROM documents
        |)
        |SELECT doc_id,
        |  round(1.0 - len(list_distinct(w))::DOUBLE / len(w), 4) AS dup_word_ratio,
        |  round(1.0 - len(list_distinct(bg))::DOUBLE / len(bg), 4) AS dup_bigram_ratio
        |FROM t""".stripMargin),

    // Gopher-style rule filter: the DECISION layer over the repetition/
    // quality signals — per-doc booleans from rounded (engine-stable)
    // ratios, plus the conjunction the pipeline would drop on. Pure
    // projection: the filter adds zero shuffles at any corpus size.
    "q_gopher_filter" -> Q(
      (s, d) => {
        val t = col("text")
        // w projected before the lambda (interpreted HOFs re-evaluate
        // an inline split per element — O(words²) per doc otherwise)
        val w = col("w")
        val nWords = size(w)
        val awl = round(length(regexp_replace(t, " ", "")).cast("double") / nWords, 4)
        val stop = size(filter(w, x => x.isInCollection(Seq("the", "a", "of", "and", "to"))))
        val stopRatio = round(stop.cast("double") / nWords, 4)
        val bigrams = expr(
          """transform(sequence(1, greatest(size(w) - 1, 1)),
            |  i -> concat_ws(' ', slice(w, i, 2)))""".stripMargin)
        val dupBg = round(lit(1.0) - size(array_distinct(bigrams)).cast("double")
          / size(bigrams), 4)
        Tables.documents(s, d)
          .withColumn("w", split(t, " "))
          .select(col("doc_id"), col("lang"),
          (nWords >= 15 && nWords <= 5000).as("ok_words"),
          (awl >= 3.0 && awl <= 10.0).as("ok_word_len"),
          (dupBg < 0.3).as("ok_repetition"),
          (col("lang") =!= "en" || stopRatio >= 0.01).as("ok_stopwords"))
          .withColumn("keep", col("ok_words") && col("ok_word_len")
            && col("ok_repetition") && col("ok_stopwords"))
      },
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w,
        |    [array_to_string(string_split(text, ' ')[i:i+1], ' ')
        |     FOR i IN range(1, greatest(len(string_split(text, ' ')), 2))] AS bg,
        |    length(replace(text, ' ', '')) AS nospace
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, lang, len(w) AS n_words,
        |    round(nospace::DOUBLE / len(w), 4) AS awl,
        |    round(len(list_filter(w, x -> list_contains(
        |      ['the','a','of','and','to'], x)))::DOUBLE / len(w), 4) AS stop_ratio,
        |    round(1.0 - len(list_distinct(bg))::DOUBLE / len(bg), 4) AS dup_bg
        |  FROM t
        |)
        |SELECT doc_id, lang,
        |  (n_words >= 15 AND n_words <= 5000) AS ok_words,
        |  (awl >= 3.0 AND awl <= 10.0) AS ok_word_len,
        |  (dup_bg < 0.3) AS ok_repetition,
        |  (lang <> 'en' OR stop_ratio >= 0.01) AS ok_stopwords,
        |  ((n_words >= 15 AND n_words <= 5000) AND (awl >= 3.0 AND awl <= 10.0)
        |   AND (dup_bg < 0.3) AND (lang <> 'en' OR stop_ratio >= 0.01)) AS keep
        |FROM m""".stripMargin),

    // logistic quality classifier: the fasttext-style keep/drop model
    // as a fixed-weight linear head over the same cheap per-doc
    // features the rule filters use — the decision layer a pipeline
    // swaps in once it has labeled data, here with published-style
    // hand weights so both engines replay it exactly. Pure projection:
    // zero shuffles at any corpus size; the sigmoid stays inside
    // whole-stage codegen.
    "q_quality_logit" -> Q(
      (s, d) => qualityLogit(Tables.documents(s, d)),
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w,
        |    length(replace(text, ' ', '')) AS nospace
        |  FROM documents
        |), f AS (
        |  SELECT doc_id,
        |    -2.0 + 0.8 * ln(len(w)::DOUBLE)
        |      + (-0.5) * (nospace::DOUBLE / len(w)::DOUBLE)
        |      + 6.0 * (len(list_filter(w, x -> list_contains(
        |          ['the','a','of','and','to'], x)))::DOUBLE / len(w)::DOUBLE)
        |      + (-4.0) * (1.0 - len(list_distinct(w))::DOUBLE / len(w)::DOUBLE)
        |      AS z
        |  FROM t
        |)
        |SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 4) AS quality_p,
        |  (1.0 / (1.0 + exp(-z)) >= 0.5) AS keep
        |FROM f""".stripMargin),

    // per-source document caps (data-mixing): keep the top-N docs per
    // source by length with a unique tiebreaker. The window rank gets
    // Spark's WindowGroupLimit map-side prune, so each partition ships
    // at most N rows per source to the rank shuffle.
    "q_source_cap" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id"))
        Tables.documents(s, d)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 100)
          .select(col("doc_id"), col("source"), col("rk"))
      },
      """SELECT doc_id, source,
        |  CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY n_chars DESC, doc_id) AS INT) AS rk
        |FROM documents
        |QUALIFY rk <= 100""".stripMargin),

    "q_text_pii" -> Q(
      (s, d) => redactPii(Tables.documents(s, d)),
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', '<EMAIL>', 'g'),
        |      '[0-9]{7,}', '<NUM>', 'g'),
        |    '@[a-zA-Z0-9_]+', '<HANDLE>', 'g') AS redacted
        |FROM documents""".stripMargin),

    "q_sample_stratified" -> Q(
      (s, d) => sampleStratified(Tables.documents(s, d),
        Map("en" -> 50), defaultPct = 20),
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
        |  < CASE WHEN lang = 'en' THEN 50 ELSE 20 END""".stripMargin),

    "q_text_curation" -> Q(
      (s, d) => curate(Tables.documents(s, d)),
      """WITH n AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents
        |), keep AS (
        |  SELECT min(doc_id) AS doc_id FROM n GROUP BY md5(norm)
        |), q AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |    CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS INT) AS punct,
        |    CAST(length(text) AS INT) AS n_chars,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> list_contains(['the','a','of','and','to'], w))) AS INT) AS stop
        |  FROM documents
        |), scored AS (
        |  SELECT doc_id, n_words,
        |    floor((least(n_words::DOUBLE / 100, 1.0) * 0.5
        |      + (1.0 - least(round(punct::DOUBLE / n_chars, 4) * 10, 1.0)) * 0.25
        |      + least(round(stop::DOUBLE / n_words, 4) * 5, 1.0) * 0.25) * 10000) / 10000 AS quality
        |  FROM q
        |), tok AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
        |  FROM documents
        |)
        |SELECT keep.doc_id, scored.n_words, scored.quality,
        |  tok.ws_tokens, tok.est_bpe_tokens
        |FROM keep JOIN scored ON keep.doc_id = scored.doc_id
        |JOIN tok ON keep.doc_id = tok.doc_id
        |WHERE scored.quality >= 0.3""".stripMargin),

    "q_text_langid" -> Q(
      (s, d) => languageId(Tables.documents(s, d)),
      """WITH sc AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> list_contains(['the','a','of','and','to'], w))) AS INT) AS score_en,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> list_contains(['el','la','de','y','que'], w))) AS INT) AS score_es,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> list_contains(['le','les','des','et','une'], w))) AS INT) AS score_fr
        |  FROM documents
        |)
        |SELECT doc_id, score_en, score_es, score_fr,
        |  CASE WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
        |       WHEN score_es >= score_fr THEN 'es' ELSE 'fr' END AS pred_lang
        |FROM sc""".stripMargin),

    "q_text_quality" -> Q(
      (s, d) => qualityScores(Tables.documents(s, d)),
      """WITH q AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS INT) AS n_chars,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |    CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS INT) AS punct,
        |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS INT) AS digits,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> list_contains(['the','a','of','and','to'], w))) AS INT) AS stop,
        |    CAST(length(replace(text, ' ', '')) AS INT) AS nospace
        |  FROM documents
        |)
        |SELECT doc_id, n_chars, n_words,
        |  round(nospace::DOUBLE / n_words, 4) AS avg_word_len,
        |  round(punct::DOUBLE / n_chars, 4) AS punct_ratio,
        |  round(digits::DOUBLE / n_chars, 4) AS digit_ratio,
        |  round(stop::DOUBLE / n_words, 4) AS stopword_ratio,
        |  floor((least(n_words::DOUBLE / 100, 1.0) * 0.5
        |    + (1.0 - least(round(punct::DOUBLE / n_chars, 4) * 10, 1.0)) * 0.25
        |    + least(round(stop::DOUBLE / n_words, 4) * 5, 1.0) * 0.25) * 10000) / 10000 AS quality
        |FROM q""".stripMargin),

    "q_text_tokens" -> Q(
      (s, d) => tokenCounts(Tables.documents(s, d)),
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS re_tokens,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
        |FROM documents""".stripMargin),

    "q_text_fingerprint" -> Q(
      (s, d) => fingerprints(Tables.documents(s, d)),
      """WITH n AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents
        |)
        |SELECT doc_id, md5(norm) AS fp_md5,
        |  ('0x' || substr(md5(norm), 1, 15))::BIGINT AS fp_prefix60
        |FROM n""".stripMargin),

    // corpus n-gram language-model table: top-50 bigrams over the
    // English slice. explode→count plans partial→final (the map-side
    // combine collapses each partition's bigram counts before the
    // shuffle), and the top-50 is TakeOrdered, never a global sort.
    "q_ngram_freq" -> Q(
      (s, d) => {
        val toks = filter(split(lower(col("text")), "[^a-z]+"), t => length(t) > 0)
        Tables.documents(s, d).filter(col("lang") === "en")
          .select(toks.as("toks"))
          // <2 tokens → sequence(1, 0) DESCENDS and indexes out of
          // bounds (ANSI error); DuckDB's generate_series(1, 0) is just
          // empty — filter to docs that can form a bigram
          .filter(size(col("toks")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))"))
            .as("bigram"))
          .groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("bigram")).limit(50)
      },
      """WITH t AS (
        |  SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |    x -> x <> '') AS toks
        |  FROM documents WHERE lang = 'en'
        |), g AS (
        |  SELECT toks[i] || ' ' || toks[i+1] AS bigram
        |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks)-1)) AS i)
        |)
        |SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
        |FROM g GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 50""".stripMargin),

    // corpus-LM document scoring (the cheap stand-in for perplexity
    // filtering): p(w2|w1) = c(w1,w2)/c(w1) estimated FROM the corpus
    // itself, each doc scored by its mean log bigram probability. Three
    // aggs over one exploded bigram frame; the count tables join back
    // on (w1,w2)/(w1) — all equi-joins, vocabulary-sized, broadcastable
    // at production scale.
    "q_lm_score" -> Q(
      (s, d) => {
        val toks = filter(split(lower(col("text")), "[^a-z]+"), t => length(t) > 0)
        val bi = Tables.documents(s, d).filter(col("lang") === "en")
          .select(col("doc_id"), toks.as("toks"))
          .filter(size(col("toks")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(toks) - 1), i -> struct(toks[i-1] AS w1, toks[i] AS w2))"))
            .as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        val cBi = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt12"))
        val cUni = bi.groupBy(col("w1")).agg(count(lit(1)).as("cnt1"))
        bi.join(cBi, Seq("w1", "w2")).join(cUni, Seq("w1"))
          .groupBy(col("doc_id"))
          .agg(round(avg(log(col("cnt12").cast("double") / col("cnt1"))), 4)
            .as("avg_logp"),
            count(lit(1)).as("n_bigrams"))
      },
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |    x -> x <> '') AS toks
        |  FROM documents WHERE lang = 'en'
        |), b AS (
        |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
        |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks)-1)) AS i)
        |  WHERE len(toks) >= 2
        |), c12 AS (SELECT w1, w2, count(*) AS cnt12 FROM b GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS cnt1 FROM b GROUP BY 1)
        |SELECT doc_id, round(avg(ln(CAST(cnt12 AS DOUBLE) / cnt1)), 4) AS avg_logp,
        |  CAST(count(*) AS BIGINT) AS n_bigrams
        |FROM b JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
        |GROUP BY doc_id""".stripMargin),

    // BPE tokenizer-vocabulary induction over the English slice: 20
    // merge rules learned from the word histogram (see bpeTrain — the
    // iterations are vocab-bounded, corpus-size-independent).
    // Iterative + engine-specific tie-breaks → rows-only driver check;
    // the spec verifies the exact merge sequence on a hand-computed
    // corpus.
    "q_bpe_vocab" -> Q(
      (s, d) => {
        val rules = bpeTrain(Tables.documents(s, d).filter(col("lang") === "en"),
          merges = 20, vocabWords = 2000)
        import s.implicits._
        rules.toDF("rank", "left", "right")
          .withColumn("merged", concat(col("left"), col("right")))
      },
      None),

    // the APPLY half of the tokenizer story: encode the 50 most
    // frequent words under the trained merges. Train touches the
    // histogram only; encode is a pure projection (the rules compile
    // into the plan), so at 100 TB the corpus pass costs one scan.
    // Rules depend on the data → not expressible as a static oracle;
    // exact segmentation is spec'd on the Sennrich toy corpus.
    "q_bpe_encode" -> Q(
      (s, d) => {
        val en = Tables.documents(s, d).filter(col("lang") === "en")
        val rules = bpeTrain(en, merges = 20, vocabWords = 2000)
        val top = en.select(explode(split(lower(col("text")), "[^a-z]+")).as("word"))
          .filter(length(col("word")) > 0)
          .groupBy(col("word")).agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("word")).limit(50)
        bpeEncode(top, rules)
          .withColumn("n_pieces", size(split(col("encoded"), " ")))
      },
      None),

    // Unicode NFC normalization + whitespace collapse — the canonical
    // text-cleanup projection before any hash-based dedup (composed vs
    // decomposed accents md5 differently). nfc_normalize is a native
    // codegen expression (Spark has no built-in); DuckDB ships the same
    // function under the same name, so the oracle is symmetric. Pure
    // per-row projection: no shuffle at any scale.
    "q_text_normalize" -> Q(
      (s, d) => {
        val norm = nfcNormalize(trim(regexp_replace(lower(col("text")), "\\s+", " ")))
        Tables.documents(s, d).select(col("doc_id"),
          md5(norm).as("norm_md5"), substring(norm, 1, 40).as("norm_prefix"))
      },
      """SELECT doc_id,
        |  md5(nfc_normalize(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))
        |    AS norm_md5,
        |  substr(nfc_normalize(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))),
        |    1, 40) AS norm_prefix
        |FROM documents""".stripMargin),

    // sequence packing: deterministic first-fit-with-straddle — docs in
    // doc_id order fill fixed 8192-token training bins, bin =
    // floor(prefix_tokens / budget). The prefix sum is TWO-LEVEL: a
    // per-range window over ~64 deterministic doc_id ranges plus a
    // broadcast of the 64 range offsets — never Window.orderBy with no
    // partition, which would drag the full corpus through ONE task (the
    // classic 100-TB failure mode of naive cumulative sums).
    "q_pack_sequences" -> Q(
      (s, d) => {
        val nRanges = 64
        val docs = Tables.documents(s, d).select(col("doc_id"),
          ceil(length(col("text")) / lit(4.0)).cast("long").as("toks"))
        val span = docs.agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
        val ranged = docs.crossJoin(broadcast(span))
          .withColumn("rng", least(lit(nRanges - 1),
            floor((col("doc_id") - col("lo")) * nRanges /
              (col("hi") - col("lo") + 1))).cast("long"))
          .drop("lo", "hi")
        val local = ranged.withColumn("cum",
          sum(col("toks")).over(Window.partitionBy(col("rng")).orderBy(col("doc_id"))))
        // 64 rows — the unpartitioned window is over the RANGE TOTALS
        // (a plain partial-agg sum, not the per-row window), a
        // constant-size frame at any corpus size
        val offsets = ranged.groupBy(col("rng")).agg(sum(col("toks")).as("rng_total"))
          .withColumn("offset", coalesce(
            sum(col("rng_total")).over(Window.orderBy(col("rng"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("rng"), col("offset"))
        local.join(broadcast(offsets), "rng")
          .select(col("doc_id"), col("toks"),
            floor((col("offset") + col("cum") - col("toks")) / lit(8192.0))
              .cast("long").as("bin"))
      },
      """WITH t AS (
        |  SELECT doc_id, CAST(ceil(length(text) / 4.0) AS BIGINT) AS toks
        |  FROM documents
        |)
        |SELECT doc_id, toks,
        |  CAST(floor((sum(toks) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks)
        |    / 8192.0) AS BIGINT) AS bin
        |FROM t""".stripMargin),

    // winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    // MOSS algorithm): hash every 4-token shingle, slide a window of 4
    // consecutive hashes, keep each window's min — guarantees any
    // shared run of ≥ 7 tokens between two docs shares a fingerprint,
    // at ~1/4 the fingerprint density of full shingling. One window
    // pass per doc partition; fingerprints are md5-stable so the whole
    // selection replays exactly in DuckDB.
    "q_winnowing" -> Q(
      (s, d) => {
        // the winnow (min over 4 consecutive shingle hashes) runs as
        // array algebra INSIDE each row — a doc's hashes never leave
        // it, so there is no per-doc window sort and no shuffle at all;
        // array_distinct before the explode replaces the global
        // DISTINCT (doc_id is part of the key, so per-doc dedup IS
        // global dedup). md5 stays: fingerprints are the output
        // contract and must replay byte-identically in DuckDB.
        val toks = filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0)
        Tables.documents(s, d)
          .select(col("doc_id"), toks.as("toks"))
          .filter(size(col("toks")) >= 7) // ≥ 4 shingles → ≥ 1 full window
          .select(col("doc_id"), expr(
            """transform(sequence(1, size(toks) - 3),
              |  i -> cast(conv(substring(md5(concat(
              |    toks[i-1], ' ', toks[i], ' ', toks[i+1], ' ', toks[i+2]
              |  )), 1, 8), 16, 10) as bigint))""".stripMargin).as("hs"))
          .select(col("doc_id"), explode(array_distinct(expr(
            "transform(sequence(1, size(hs) - 3), j -> array_min(slice(hs, j, 4)))"
          ))).as("fp"))
      },
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text),
        |    '[^a-z0-9]+'), x -> x <> '') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, i, ('0x' || substr(md5(toks[i] || ' ' || toks[i+1]
        |    || ' ' || toks[i+2] || ' ' || toks[i+3]), 1, 8))::BIGINT AS h
        |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks)-3)) AS i)
        |  WHERE len(toks) >= 4
        |), w AS (
        |  SELECT doc_id, i,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
        |    count(*) OVER (PARTITION BY doc_id) AS n
        |  FROM g
        |)
        |SELECT DISTINCT doc_id, fp FROM w WHERE i <= n - 3""".stripMargin)
  )
}
