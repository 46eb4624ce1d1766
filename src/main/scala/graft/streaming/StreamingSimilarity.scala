package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous ANN serving: probe vectors arrive on a stream and each
  * micro-batch beam-searches a PREBUILT k-NN graph index
  * (Similarity.buildGraphIndex). This is the serving split that matters
  * at scale: the index build shuffles the full corpus ONCE (the heavy
  * batch job); each probe micro-batch then touches only
  * |probes|·beam·degree candidate rows against the cached index —
  * corpus-size-independent, which is the whole point of graph ANN.
  *
  * foreachBatch rather than a stream-stream join because the search is
  * ITERATIVE (beam rounds) — not expressible as a single incremental
  * join topology; each batch runs the same deterministic batch search
  * the oracle-checked q_ann_graph uses.
  */
object StreamingSimilarity {

  /** Start serving `probeStream` (vec_id, embedding) against the index.
    * `sink` receives each micro-batch's (probe_id, neighbor_id, rank,
    * cos_sim) frame together with the batch id — a memory-table append
    * in tests, any writer in production. */
  def serveGraphAnn(vecs: DataFrame, edges: DataFrame,
                    probeStream: DataFrame, k: Int = 10, beam: Int = 20,
                    rounds: Int = 3)(
                    sink: (DataFrame, Long) => Unit): StreamingQuery =
    probeStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          sink(Similarity.searchGraphIndex(vecs, edges, batch,
            k, beam, rounds), batchId)
      }
      .start()
}
