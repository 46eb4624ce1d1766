package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (streaming) variants of the corpus-statistics operators
  * in graft.operators.Search / TextAnalysis. The declarative Column
  * logic is IDENTICAL to the batch forms — on a streaming frame Spark
  * plans the same aggregation as a stateful operator whose partial
  * aggregates live in the state store, so every micro-batch folds new
  * documents into the running statistics instead of rescanning the
  * corpus. Update output mode emits only the changed rows.
  *
  * Scale posture: state is keyed by term / (lang, source) — hash-
  * partitioned across executors, no global state; a RocksDB state
  * store backend handles vocabulary sizes beyond executor memory.
  */
object StreamingText {

  /** Incremental document frequency — the corpus-level half of TF-IDF.
    * array_distinct before explode makes each (doc, term) pair count
    * once, so the running `df` is exact document frequency; idf =
    * ln(N/df) derives at read time from this frame plus the running
    * doc count (`incrementalDocCount`). Contract note: empty tokens
    * (from consecutive whitespace) are DROPPED here — df('') is
    * meaningless state — whereas the raw batch split in Search keeps
    * them; join the two frames on non-empty terms only.
    */
  def incrementalTermDf(docs: DataFrame): DataFrame =
    docs.select(explode(array_distinct(split(col("text"), " "))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Running corpus document count (the N in idf = ln(N/df)). */
  def incrementalDocCount(docs: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"))

  /** Incremental domain-mixture statistics: running per-(lang, source)
    * doc and token counts. The inverse-sqrt upweight of the batch
    * domainMix derives from these counts at read time — the stream
    * maintains only the additive statistics (counts fold; weights
    * don't).
    */
  def incrementalDomainMix(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))

  /** Streaming mixing gate: apply a (periodically recomputed) static
    * rate table to a document stream. The keep decision is the same
    * md5-hash gate as the batch q_mix_sample — STATELESS, so it
    * composes with any output mode, survives restarts without a state
    * store, and admits exactly the same doc ids the batch pipeline
    * would (replayable backfills). `rates` must carry
    * (lang, source, cut∈[0,10000]); it broadcasts, the stream never
    * shuffles.
    */
  def mixGate(docs: DataFrame, rates: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.join(broadcast(rates), Seq("lang", "source"))
      .filter(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long") % 10000 < col("cut"))
      .drop("cut")
}
