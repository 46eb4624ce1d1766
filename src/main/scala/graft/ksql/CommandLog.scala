package graft.ksql

import java.nio.ByteBuffer
import java.nio.channels.{FileChannel, OverlappingFileLockException}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardOpenOption}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** File-backed append-only statement log — the embedded analogue of the
  * KSQL server cluster's command topic. The reference deployment runs a
  * ksql-server CLUSTER: every server replays the shared command topic,
  * so DDL issued to one node binds on all, and a restarted node rebuilds
  * its catalog by replaying from the beginning. This class gives the
  * same semantic over a shared file: one JSON-wrapped statement per
  * line, every mutation appended under an exclusive lock, and every
  * reader applying entries in file order.
  *
  * Total ordering is real, not best-effort: `transact` holds the lock
  * across replay-of-new-entries AND the caller's own statement
  * execution AND the append, so two servers (processes or threads)
  * interleave whole statements, never halves — the file plays the role
  * Kafka's single-partition command topic plays for the reference.
  * Cross-process exclusion is the OS file lock; same-JVM exclusion (two
  * embedded servers in one test JVM — the spec's shape) is a per-path
  * monitor, because the JDK throws [[OverlappingFileLockException]]
  * rather than queueing overlapping locks from one JVM.
  *
  * Entries are JSON objects (`{"stmt": "..."}`), so multi-line
  * statements survive the line framing. A torn tail line (a writer
  * crashed mid-append) is left unconsumed — offsets only ever advance
  * past complete, newline-terminated entries.
  */
final class CommandLog(val path: Path) {
  Option(path.toAbsolutePath.getParent).foreach(Files.createDirectories(_))
  try Files.createFile(path)
  catch { case _: java.nio.file.FileAlreadyExistsException => () }

  /** Sidecar snapshot: a compacted statement list equivalent (for
    * late-joiner catalog purposes) to the log prefix up to byte offset
    * `upto`. Late-joiner start cost is then bounded by CATALOG size —
    * snapshot statements + the post-`upto` tail — instead of growing
    * with the full DDL history (the real command topic has the same
    * problem; ksqlDB leaves it uncompacted, we don't). Format: one JSON
    * line `{"upto": N}` then one `{"stmt": …}` line per statement, same
    * framing as the log. Written atomically (temp + move) under the
    * log's own lock, so a crashed compaction leaves the previous
    * snapshot intact and the torn-tail rules of the MAIN log are
    * untouched. */
  private def snapshotPath: Path =
    path.resolveSibling(path.getFileName.toString + ".snapshot")

  /** Atomically replace the snapshot. `upto` MUST be a complete-entry
    * boundary the caller has fully applied (an `applied` offset). */
  def writeSnapshot(upto: Long, stmts: Seq[String]): Unit =
    CommandLog.jvmLock(path).synchronized {
      val ch = FileChannel.open(path,
        StandardOpenOption.READ, StandardOpenOption.WRITE)
      try {
        val flock = try ch.lock()
        catch { case _: OverlappingFileLockException => null }
        try {
          val body = (JsonMethods.compact(
            JObject("upto" -> JLong(upto))) + "\n" +
            stmts.map(CommandLog.encode(_) + "\n").mkString).getBytes(UTF_8)
          val tmp = path.resolveSibling(
            path.getFileName.toString + ".snapshot.tmp")
          Files.write(tmp, body)
          Files.move(tmp, snapshotPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        } finally if (flock != null) flock.release()
      } finally ch.close()
    }

  /** The latest snapshot, if one exists and parses: (upto, statements).
    * A malformed snapshot is ignored (the full log is always the source
    * of truth — a reader falls back to offset-zero replay). */
  def readSnapshot(): Option[(Long, Seq[String])] =
    CommandLog.jvmLock(path).synchronized {
      val sp = snapshotPath
      if (!Files.exists(sp)) None
      else try {
        val lines = new String(Files.readAllBytes(sp), UTF_8)
          .split("\n").iterator.filter(_.nonEmpty).toSeq
        lines.headOption.flatMap { h =>
          JsonMethods.parse(h) \ "upto" match {
            case JInt(n) => Some((n.toLong,
              lines.tail.flatMap(CommandLog.decode(_))))
            case JLong(n) => Some((n,
              lines.tail.flatMap(CommandLog.decode(_))))
            case _ => None
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Replay entries beyond byte offset `applied` through `replay` (in
    * file order), then run `body`; if it returns a statement, append it
    * before the lock releases. Returns the new applied offset. The lock
    * spans all three steps — see the class doc for why. */
  def transact(applied: Long, replay: String => Unit)
              (body: () => Option[String]): Long = {
    CommandLog.jvmLock(path).synchronized {
      val ch = FileChannel.open(path,
        StandardOpenOption.READ, StandardOpenOption.WRITE)
      try {
        // file lock for OTHER processes; same-JVM callers are already
        // serialized by the per-path monitor above
        val flock = try ch.lock()
        catch { case _: OverlappingFileLockException => null }
        try {
          var off = applied
          val size = ch.size()
          var torn = false
          if (size > off) {
            val buf = ByteBuffer.allocate((size - off).toInt)
            var read = 0
            while (read >= 0 && buf.hasRemaining)
              read = ch.read(buf, off + buf.position())
            val text = new String(buf.array(), 0, buf.position(), UTF_8)
            val lastNl = text.lastIndexOf('\n')
            torn = !text.endsWith("\n")
            if (lastNl >= 0) {
              val complete = text.substring(0, lastNl + 1)
              complete.split("\n").iterator.filter(_.nonEmpty)
                .foreach(l => CommandLog.decode(l).foreach(replay))
              off += complete.getBytes(UTF_8).length
            }
          }
          body() match {
            case Some(stmt) =>
              // a torn tail (writer crashed mid-append) gets newline-
              // terminated first so our entry never merges with it; the
              // garbage line fails decode on replay and is skipped
              val line = ((if (torn) "\n" else "") +
                CommandLog.encode(stmt) + "\n").getBytes(UTF_8)
              val wbuf = ByteBuffer.wrap(line)
              var pos = ch.size()
              while (wbuf.hasRemaining) pos += ch.write(wbuf, pos)
              ch.force(false)
              // our own entry is applied by construction (we just ran it)
              ch.size()
            case None => off
          }
        } finally if (flock != null) flock.release()
      } finally ch.close()
    }
  }
}

object CommandLog {
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def jvmLock(path: Path): Object =
    jvmLocks.computeIfAbsent(path.toAbsolutePath.normalize.toString,
      _ => new Object)

  private[ksql] def encode(stmt: String): String =
    JsonMethods.compact(JObject("stmt" -> JString(stmt)))

  private[ksql] def decode(line: String): Option[String] =
    try JsonMethods.parse(line) \ "stmt" match {
      case JString(s) => Some(s)
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None }
}
