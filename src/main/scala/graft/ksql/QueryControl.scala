package graft.ksql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** PAUSE / RESUME support for persistent queries (ksqlDB 0.23+ surface:
  * `PAUSE <id|ALL>` suspends message processing, `RESUME <id|ALL>`
  * continues it; the query stays registered either way).
  *
  * Spark's StreamingQuery has no native pause, so graft implements the
  * semantic the way a KSQL server actually does across restarts: STOP
  * the query but keep its identity + a restart thunk, and RESUME
  * re-issues `start()` against the SAME sink + checkpoint — Structured
  * Streaming's checkpoint contract then continues from the exact
  * committed offset, which is precisely ksqlDB's "processing resumes
  * where it left off". Only queries started through
  * [[startRegistered]] are resumable (the thunk carries the
  * definition); PAUSE on an unregistered active query is refused
  * rather than silently becoming a TERMINATE.
  *
  * Session-scoped, weak-keyed like the Translator's property store, so
  * a stopped SparkSession never stays pinned by its registry.
  */
object QueryControl {

  private final case class Entry(restart: () => StreamingQuery,
      var paused: Boolean)

  private val registries =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Entry]]

  private def regFor(spark: SparkSession) =
    registries.synchronized {
      var m = registries.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, Entry]
        registries.put(spark, m)
      }
      m
    }

  /** Start a continuous query through the registry: `start` must issue
    * `writeStream.queryName(name)...start()` with a durable checkpoint
    * if resume-from-offset matters. Re-registering a name replaces the
    * old thunk (latest definition wins, the CREATE OR REPLACE shape). */
  def startRegistered(spark: SparkSession, name: String)
      (start: => StreamingQuery): StreamingQuery = {
    val q = start
    regFor(spark).put(name, Entry(() => start, paused = false))
    q
  }

  /** ksqlDB's CREATE OR REPLACE query-upgrade semantic: stop the
    * running instance of `name` (if any), swap in the NEW definition's
    * start thunk, and start it against the same sink + checkpoint —
    * committed offsets carry over, so rows processed under the old
    * definition are not reprocessed and new input flows through the
    * new logic. Spark permits filter/projection changes across a
    * checkpoint restart (the upgrade classes ksqlDB allows without a
    * new query id); stateful-shape changes fail at start() exactly as
    * they should. */
  def replaceRegistered(spark: SparkSession, name: String)
      (start: => StreamingQuery): StreamingQuery = {
    activeByName(spark, name).foreach { q => q.stop(); q.awaitTermination() }
    val q = start
    regFor(spark).put(name, Entry(() => start, paused = false))
    q
  }

  /** PAUSE <name|ALL>: stop the running query, keep it resumable.
    * Returns the names paused. Unregistered names are refused —
    * stopping a query we cannot restart would be TERMINATE in
    * disguise. ALL pauses every registered, currently-active query. */
  def pause(spark: SparkSession, id: String): Seq[String] = {
    val reg = regFor(spark)
    val targets: Seq[String] =
      if (id.equalsIgnoreCase("ALL"))
        reg.keys.toSeq.filter(n => activeByName(spark, n).isDefined)
      else {
        if (!reg.contains(id))
          throw new IllegalArgumentException(
            s"no registered query $id (only queries started through the " +
              "runtime are pausable; use TERMINATE to stop others)")
        Seq(id)
      }
    targets.sorted.map { n =>
      activeByName(spark, n).foreach { q => q.stop(); q.awaitTermination() }
      reg(n).paused = true
      n
    }
  }

  /** RESUME <name|ALL>: re-start every paused target from its
    * checkpointed offsets. Returns the names resumed. */
  def resume(spark: SparkSession, id: String): Seq[String] = {
    val reg = regFor(spark)
    val targets: Seq[String] =
      if (id.equalsIgnoreCase("ALL")) reg.collect {
        case (n, e) if e.paused => n
      }.toSeq
      else {
        if (!reg.get(id).exists(_.paused))
          throw new IllegalArgumentException(s"no paused query $id")
        Seq(id)
      }
    targets.sorted.map { n =>
      val e = reg(n)
      e.restart()
      e.paused = false
      n
    }
  }

  /** PAUSED names for this session (feeds SHOW QUERIES' state column). */
  def pausedNames(spark: SparkSession): Set[String] =
    regFor(spark).collect { case (n, e) if e.paused => n }.toSet

  /** Drop a name from the registry (after TERMINATE, so a dead query
    * doesn't linger as resumable). */
  def forget(spark: SparkSession, name: String): Unit =
    regFor(spark).remove(name)

  private def activeByName(spark: SparkSession, name: String) =
    spark.streams.active.find(q => Option(q.name).contains(name))
}
