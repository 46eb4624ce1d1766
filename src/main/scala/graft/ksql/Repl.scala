package graft.ksql

import java.io.{BufferedReader, PrintWriter}
import org.apache.spark.sql.SparkSession

/** Interactive KSQL shell over the translator — the reference's CLI
  * workflow (declare streams, chain CSAS/CTAS, run pull queries) on a
  * Spark session. Statements terminate with ';' and may span lines;
  * the catalog threads through so CSAS outputs are referencable by
  * later statements, exactly like `Translator.runScript`.
  *
  * `loop` is the testable core (reader/writer injected); `main` binds
  * stdin/stdout with an optional sf-dir whose tables pre-populate the
  * catalog. Results print at most `maxRows` rows — a pull query's
  * result is a DataFrame, so the REPL never collects more than the
  * display page to the driver.
  */
object Repl {

  private val Prompt = "ksql> "

  def preloadCatalog(spark: SparkSession, sfDir: String): Translator.Catalog = {
    import graft.Tables
    Map(
      "region" -> Translator.Source(Tables.region(spark, sfDir), "r_regionkey"),
      "nation" -> Translator.Source(Tables.nation(spark, sfDir), "n_nationkey"),
      "customer" -> Translator.Source(Tables.customer(spark, sfDir), "c_custkey"),
      "supplier" -> Translator.Source(Tables.supplier(spark, sfDir), "s_suppkey"),
      "part" -> Translator.Source(Tables.part(spark, sfDir), "p_partkey"),
      "orders" -> Translator.Source(Tables.orders(spark, sfDir), "o_orderdate"),
      "lineitem" -> Translator.Source(Tables.lineitem(spark, sfDir), "l_shipdate"),
      "events" -> Translator.Source(Tables.events(spark, sfDir), "ts"),
      "documents" -> Translator.Source(Tables.documents(spark, sfDir), "doc_id"),
      "embeddings" -> Translator.Source(Tables.embeddings(spark, sfDir), "vec_id"))
  }

  /** Read statements until EOF or EXIT/QUIT; returns the final catalog.
    * Errors print and the loop continues — one bad statement must not
    * kill the session.
    */
  def loop(spark: SparkSession, in: BufferedReader, out: PrintWriter,
           catalog0: Translator.Catalog, maxRows: Int = 20): Translator.Catalog = {
    var catalog = catalog0
    val buf = new StringBuilder
    // SPOOL 'file' (ksql CLI surface): result/error lines mirror to the
    // file until SPOOL OFF; bare SPOOL reports status. CLI-level like
    // EXIT — never reaches the translator.
    var spool: Option[PrintWriter] = None
    var spoolPath = ""
    def emit(s: String): Unit = { out.println(s); spool.foreach(_.println(s)) }
    def closeSpool(): Unit = { spool.foreach(_.close()); spool = None }
    val SpoolRe = "(?is)^SPOOL\\s+(?:(OFF)|'([^']*)')$".r
    out.print(Prompt); out.flush()
    var line = in.readLine()
    while (line != null) {
      val t = line.trim
      if (buf.toString.trim.isEmpty && (t.equalsIgnoreCase("exit") || t.equalsIgnoreCase("quit")
        || t.equalsIgnoreCase("exit;") || t.equalsIgnoreCase("quit;"))) {
        out.println("bye"); out.flush()
        closeSpool()
        return catalog
      }
      buf.append(line).append('\n')
      // an UNQUOTED ';' in the buffer closes ≥1 statement (a ';' inside
      // a 'string literal' must not tear the statement); trailing text
      // stays buffered for the next round
      val text = buf.toString
      val lastSemi = {
        var inStr = false; var last = -1
        for (i <- text.indices) text.charAt(i) match {
          case '\'' => inStr = !inStr
          case ';' if !inStr => last = i
          case _ =>
        }
        last
      }
      if (lastSemi >= 0) {
        buf.clear(); buf.append(text.substring(lastSemi + 1))
        Translator.splitStatements(text.substring(0, lastSemi)).foreach { stmt =>
          stmt.trim match {
            case SpoolRe(off, _) if off != null =>
              closeSpool(); out.println(s"spool off ($spoolPath)")
            case SpoolRe(_, path) =>
              closeSpool()
              try {
                spool = Some(new PrintWriter(
                  new java.io.FileWriter(path, /* append = */ true)))
                spoolPath = path
                out.println(s"spooling to $path")
              } catch {
                case e: Exception => out.println(s"error: ${e.getMessage}")
              }
            case s if s.equalsIgnoreCase("SPOOL") =>
              out.println(spool.fold("spool is off")(_ => s"spooling to $spoolPath"))
            case _ =>
              try {
                val (cat2, res) = Translator.run(spark, catalog, stmt)
                catalog = cat2
                res match {
                  case Some(df) if df.isStreaming =>
                    emit(s"[streaming query: ${df.schema.map(_.name).mkString(", ")}]")
                  case Some(df) =>
                    val rows = df.limit(maxRows + 1).collect()
                    emit(df.schema.map(_.name).mkString(" | "))
                    rows.take(maxRows).foreach(r => emit(r.mkString(" | ")))
                    if (rows.length > maxRows) emit(s"... (showing first $maxRows)")
                  case None => emit("ok")
                }
              } catch {
                case e: Exception => emit(s"error: ${e.getMessage}")
              }
          }
        }
      }
      out.print(Prompt); out.flush()
      line = in.readLine()
    }
    closeSpool()
    catalog
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-ksql-repl").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // UTC like every other entry point: NTZ→TIMESTAMP casts are
      // session-timezone-dependent
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val catalog =
      if (args.nonEmpty) preloadCatalog(spark, args(0))
      else Map.empty[String, Translator.Source]
    val in = new BufferedReader(new java.io.InputStreamReader(System.in))
    val out = new PrintWriter(System.out)
    out.println("graft ksql repl — ';' ends a statement, EXIT quits")
    if (catalog.nonEmpty)
      out.println(s"catalog: ${catalog.keys.toSeq.sorted.mkString(", ")}")
    loop(spark, in, out, catalog)
    spark.stop()
  }
}
