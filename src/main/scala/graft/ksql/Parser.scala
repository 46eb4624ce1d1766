package graft.ksql

/** Hand-rolled tokenizer + recursive-descent parser for the KSQL
  * statement subset. Case-insensitive keywords, 'single-quoted' strings,
  * backtick-free identifiers (KSQL uppercases unquoted idents; we keep
  * them as written and match case-insensitively downstream).
  */
object Parser {

  // ---- lexer ---------------------------------------------------------
  final case class Tok(text: String, isString: Boolean, start: Int = -1) {
    def up: String = text.toUpperCase
    /** Source offset just past this token (start < 0 → unknown). */
    def end: Int = if (start < 0) -1 else start + text.length
  }

  def tokenize(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        // '' inside a literal is an escaped quote — one token, one quote
        val strStart = i
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (!closed && i < n) {
          val ch = sql.charAt(i)
          if (ch == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') { sb.append('\''); i += 2 }
            else { closed = true; i += 1 }
          } else { sb.append(ch); i += 1 }
        }
        out += Tok(sb.toString, isString = true, start = strStart)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
        out += Tok(sql.substring(start, i), isString = false, start = start)
      } else if (c.isDigit) {
        val start = i
        while (i < n && (sql.charAt(i).isDigit || sql.charAt(i) == '.')) i += 1
        out += Tok(sql.substring(start, i), isString = false, start = start)
      } else if ("<>!=".contains(c) && i + 1 < n && sql.charAt(i + 1) == '=') {
        out += Tok(sql.substring(i, i + 2), isString = false, start = i); i += 2
      } else if (c == '=' && i + 1 < n && sql.charAt(i + 1) == '>') {
        // ksqlDB lambda arrow: one token, so reconstruction keeps the
        // `=>` glued for the rewriter's lambda pass
        out += Tok("=>", isString = false, start = i); i += 2
      } else if (c == ':' && i + 1 < n && sql.charAt(i + 1) == '=') {
        // MAP('k' := v) assign: one token, so reconstruction keeps the
        // `:=` glued for the constructor rewrite's entry split
        out += Tok(":=", isString = false, start = i); i += 2
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '>') {
        // struct-deref arrow: one token, so reconstruction can glue it
        // back tight (s->f) for the rewriter's tight-form rule
        out += Tok("->", isString = false, start = i); i += 2
      } else {
        out += Tok(c.toString, isString = false, start = i); i += 1
      }
    }
    out.result()
  }

  // ---- parser --------------------------------------------------------
  final class P(val toks: Vector[Tok]) {
    var pos = 0
    def atEnd: Boolean = pos >= toks.length
    def peek: Tok = if (pos < toks.length) toks(pos) else Tok("", isString = false)
    def peekUp: String = peek.up
    def next(): Tok = { val t = peek; pos += 1; t }
    def accept(kw: String): Boolean =
      if (!peek.isString && peekUp == kw) { pos += 1; true } else false
    def expect(kw: String): Unit =
      if (!accept(kw)) fail(s"expected $kw, got '${peek.text}'")
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"KSQL parse error at token $pos: $msg")
    def done: Boolean = pos >= toks.length || peekUp == ";"
  }

  private val durationUnits = Map(
    "MILLISECOND" -> 1L, "MILLISECONDS" -> 1L,
    "SECOND" -> 1000L, "SECONDS" -> 1000L,
    "MINUTE" -> 60000L, "MINUTES" -> 60000L,
    "HOUR" -> 3600000L, "HOURS" -> 3600000L,
    "DAY" -> 86400000L, "DAYS" -> 86400000L)

  private def limitOperand(p: P): Int = {
    val t = p.next()
    if (t.isString || !t.text.matches("\\d+"))
      p.fail(s"LIMIT expects an integer literal, got '${t.text}'")
    t.text.toInt
  }

  /** Re-join the remaining tokens of a statement into one text — word
    * tokens keep a separating space (STRUCT<street VARCHAR> must not
    * fuse into streetVARCHAR), punctuation glues tight. */
  private def rejoinToEnd(p: P): String = {
    val sb = new StringBuilder
    while (!p.done) {
      val t = p.next().text
      if (sb.nonEmpty && sb.last.isLetterOrDigit &&
          t.nonEmpty && t.charAt(0).isLetterOrDigit) sb.append(' ')
      sb.append(t)
    }
    sb.toString
  }

  private def parseDuration(p: P): Long = {
    val num = p.next().text.toDouble
    val unit = p.next().up
    (num * durationUnits.getOrElse(unit, p.fail(s"unknown unit $unit"))).toLong
  }

  def parse(sql: String): Statement = {
    val p = new P(tokenize(sql))
    val stmt =
      if (p.accept("CREATE")) {
        if (p.accept("TYPE")) {
          // CREATE TYPE name AS <type> — the type text runs to the end
          // of the statement (composite types tokenize into many parts)
          val name = p.next().text
          p.expect("AS")
          if (p.done) p.fail("CREATE TYPE expects a type after AS")
          CreateType(name, rejoinToEnd(p))
        } else if (p.accept("MATERIALIZED")) {
          // CREATE MATERIALIZED VIEW [IF NOT EXISTS] name
          //   WITH (STATE_DIR='…', DELTA='<predicate>') AS SELECT …
          p.expect("VIEW")
          val ifNotExists =
            if (p.accept("IF")) { p.expect("NOT"); p.expect("EXISTS"); true }
            else false
          val name = p.next().text
          val props = Map.newBuilder[String, String]
          if (p.accept("WITH")) {
            p.expect("(")
            while (!p.accept(")")) {
              if (p.done) p.fail("expected ) closing WITH properties")
              val k = p.next().up
              p.expect("=")
              props += (k -> p.next().text)
              p.accept(",")
            }
          }
          p.expect("AS")
          CreateMaterializedView(name, props.result(), parseSelect(p),
            ifNotExists)
        } else if (p.peekUp == "SOURCE" || p.peekUp == "SINK") {
          // CREATE SOURCE|SINK CONNECTOR [IF NOT EXISTS] name WITH (...)
          // — ksqlDB's connector DDL (proxied to Kafka Connect by the
          // real server; graft runs an embedded file-connector runtime).
          // Connector property keys are quoted strings ('input.path');
          // normalize to upper-case like every other WITH map.
          val isSource = p.accept("SOURCE") || { p.expect("SINK"); false }
          p.expect("CONNECTOR")
          val ifNotExists =
            if (p.accept("IF")) { p.expect("NOT"); p.expect("EXISTS"); true }
            else false
          val name = p.next().text
          p.expect("WITH")
          p.expect("(")
          val props = Map.newBuilder[String, String]
          while (!p.accept(")")) {
            if (p.done) p.fail("expected ) closing connector properties")
            val k = p.next().text.toUpperCase
            p.expect("=")
            props += (k -> p.next().text)
            p.accept(",")
          }
          CreateConnector(isSource, name, props.result(), ifNotExists)
        } else {
        val orReplace = if (p.accept("OR")) { p.expect("REPLACE"); true } else false
        val isTable = if (p.accept("TABLE")) true
          else { p.expect("STREAM"); false }
        val ifNotExists =
          if (p.accept("IF")) { p.expect("NOT"); p.expect("EXISTS"); true } else false
        val name = p.next().text
        if (p.peekUp == "(")
          parseCreateSource(p, isTable, name, ifNotExists, orReplace)
        else {
          // CREATE ... name [WITH (K=V, ...)] AS SELECT — the WITH props
          // bind the materialization target (PATH / VALUE_FORMAT)
          val props = Map.newBuilder[String, String]
          if (p.accept("WITH")) {
            p.expect("(")
            while (!p.accept(")")) {
              if (p.done) p.fail("expected ) closing WITH properties")
              val k = p.next().up
              p.expect("=")
              props += (k -> p.next().text)
              p.accept(",")
            }
          }
          // column-less CREATE ... WITH (...) and no AS: a source bound
          // entirely by its WITH props — legal when the format is
          // self-describing (AVRO embeds the writer schema) or the
          // catalog already provides the frame
          val ps = props.result()
          if (p.done && ps.nonEmpty)
            CreateSource(isTable, name, Nil, ps, ifNotExists, orReplace)
          else {
            p.expect("AS")
            CreateAsSelect(isTable, name, parseSelect(p), ps, ifNotExists)
          }
        }
        }
      } else if (p.accept("INSERT")) {
        p.expect("INTO")
        val target = p.next().text
        if (p.peekUp == "(" || p.peekUp == "VALUES") {
          // INSERT INTO t [(c1, …)] VALUES (v1, …) — the CLI test-data path
          val cols = Seq.newBuilder[String]
          if (p.accept("(")) {
            while (!p.accept(")")) {
              if (p.done) p.fail("expected ) closing the column list")
              cols += p.next().text
              p.accept(",")
            }
          }
          p.expect("VALUES")
          p.expect("(")
          val vals = Seq.newBuilder[String]
          while (!p.accept(")")) {
            if (p.done) p.fail("expected ) closing VALUES")
            vals += exprUntil(p, Set(",", ")"))
            p.accept(",")
          }
          InsertValues(target, cols.result(), vals.result())
        } else InsertInto(target, parseSelect(p))
      } else if (p.accept("PRINT")) {
        // PRINT 'name'|name [FROM BEGINNING] [INTERVAL n] [LIMIT n] —
        // peek at a source's rows (full KSQL 5.x option surface)
        val name = p.next().text
        val fromBeginning =
          if (p.accept("FROM")) { p.expect("BEGINNING"); true } else false
        val interval = if (p.accept("INTERVAL")) limitOperand(p) else 1
        if (interval < 1) p.fail("INTERVAL must be >= 1")
        val limit = if (p.accept("LIMIT")) limitOperand(p) else 10
        PrintRows(name, limit, interval, fromBeginning)
      } else if (p.accept("REFRESH")) {
        // REFRESH MATERIALIZED VIEW name
        //   WITH (STATE_DIR='…', DELTA='<pred>' [, DELETED='<pred>'])
        p.expect("MATERIALIZED"); p.expect("VIEW")
        val name = p.next().text
        val props = Map.newBuilder[String, String]
        if (p.accept("WITH")) {
          p.expect("(")
          while (!p.accept(")")) {
            if (p.done) p.fail("expected ) closing WITH properties")
            val k = p.next().up
            p.expect("=")
            props += (k -> p.next().text)
            p.accept(",")
          }
        }
        RefreshMaterializedView(name, props.result())
      } else if (p.accept("SHOW") || p.accept("LIST")) {
        // LIST is KSQL's synonym for SHOW
        if (p.accept("TABLES")) ShowSources(tables = true)
        else if (p.accept("CONNECTORS")) ShowConnectors
        else if (p.accept("QUERIES")) ShowQueries
        else if (p.accept("PROPERTIES")) ShowProperties
        else if (p.accept("FUNCTIONS")) ShowFunctions
        else if (p.accept("VARIABLES")) ShowVariables
        else if (p.accept("TYPES")) ShowTypes
        else if (p.accept("MATERIALIZED")) {
          p.expect("VIEWS"); ShowMaterializedViews
        }
        // TOPICS: the file-backed analogue lists the same catalog —
        // every bound source IS a "topic" in this engine's model
        else if (p.accept("TOPICS")) ShowSources(tables = false)
        else { p.expect("STREAMS"); ShowSources(tables = false) }
      } else if (p.accept("SET")) {
        // SET 'key' = 'value' (quoted, KSQL CLI style). An unquoted
        // dotted key (SET auto.offset.reset = 'earliest') lexes as
        // several tokens — rejoin everything up to '='.
        val sb = new StringBuilder
        while (!p.done && p.peek.text != "=") sb.append(p.next().text)
        if (sb.isEmpty) p.fail("SET expects a property key before '='")
        p.expect("=")
        SetProp(sb.toString, p.next().text)
      } else if (p.accept("UNSET")) {
        // same rejoin for dotted keys (UNSET runs to end-of-statement)
        val sb = new StringBuilder
        while (!p.done) sb.append(p.next().text)
        if (sb.isEmpty) p.fail("UNSET expects a property key")
        UnsetProp(sb.toString)
      } else if (p.accept("TERMINATE")) {
        // a query id is a UUID, which the lexer splits at '-' — rejoin
        // everything to end-of-statement (UUIDs contain no spaces)
        val sb = new StringBuilder
        while (!p.done) sb.append(p.next().text)
        if (sb.isEmpty) p.fail("TERMINATE expects a query id, name, or ALL")
        Terminate(sb.toString)
      } else if (p.accept("ASSERT")) {
        // ksqlDB testing surface:
        //   ASSERT [NOT EXISTS] TOPIC|STREAM|TABLE name [TIMEOUT n SECONDS]
        //   ASSERT [NOT EXISTS] SCHEMA SUBJECT 'x' [REGISTRY 'dir']
        //                                          [TIMEOUT n SECONDS]
        val notExists =
          if (p.accept("NOT")) { p.expect("EXISTS"); true } else false
        val kindTok = p.next().up
        if (!Set("TOPIC", "STREAM", "TABLE", "SCHEMA").contains(kindTok))
          p.fail(s"ASSERT expects TOPIC, STREAM, TABLE or SCHEMA, got $kindTok")
        val (name, registry) = if (kindTok == "SCHEMA") {
          p.expect("SUBJECT")
          val subj = p.next().text
          val reg = if (p.accept("REGISTRY")) Some(p.next().text) else None
          (subj, reg)
        } else (p.next().text, None)
        val timeoutMs = if (p.accept("TIMEOUT")) {
          val n = limitOperand(p).toLong
          p.expect("SECONDS")
          n * 1000L
        } else 0L
        AssertExists(kindTok, name, registry, notExists, timeoutMs)
      } else if (p.accept("PAUSE")) {
        // same UUID rejoin as TERMINATE
        val sb = new StringBuilder
        while (!p.done) sb.append(p.next().text)
        if (sb.isEmpty) p.fail("PAUSE expects a query id, name, or ALL")
        Pause(sb.toString)
      } else if (p.accept("RESUME")) {
        val sb = new StringBuilder
        while (!p.done) sb.append(p.next().text)
        if (sb.isEmpty) p.fail("RESUME expects a query id, name, or ALL")
        Resume(sb.toString)
      } else if (p.accept("RUN")) {
        p.expect("SCRIPT")
        val t = p.next()
        if (!t.isString) p.fail("RUN SCRIPT expects a quoted file path")
        RunScript(t.text)
      } else if (p.accept("DESCRIBE")) {
        if (p.accept("FUNCTION")) DescribeFunction(p.next().text)
        else if (p.accept("CONNECTOR")) DescribeConnector(p.next().text)
        else {
          val ext = p.accept("EXTENDED")
          Describe(p.next().text, ext)
        }
      } else if (p.accept("DEFINE")) {
        // DEFINE name = 'value' (ksqlDB CLI variable; value must be a
        // quoted string, matching the CLI's grammar)
        val name = p.next().text
        p.expect("=")
        val v = p.next()
        if (!v.isString) p.fail("DEFINE expects a 'quoted' value")
        DefineVar(name, v.text)
      } else if (p.accept("UNDEFINE")) {
        UndefineVar(p.next().text)
      } else if (p.accept("DROP")) {
        if (p.accept("MATERIALIZED")) {
          p.expect("VIEW")
          val ifExists = if (p.accept("IF")) { p.expect("EXISTS"); true } else false
          DropMaterializedView(p.next().text, ifExists)
        } else if (p.accept("TYPE")) {
          val ifExists = if (p.accept("IF")) { p.expect("EXISTS"); true } else false
          DropType(p.next().text, ifExists)
        } else if (p.accept("CONNECTOR")) {
          val ifExists = if (p.accept("IF")) { p.expect("EXISTS"); true } else false
          DropConnector(p.next().text, ifExists)
        } else {
        if (!p.accept("STREAM")) p.expect("TABLE")
        val ifExists = if (p.accept("IF")) { p.expect("EXISTS"); true } else false
        DropSource(p.next().text, ifExists)
        }
      } else if (p.accept("EXPLAIN")) {
        // two public forms: EXPLAIN <select> (plan of a statement) and
        // EXPLAIN <queryId|name> (status + plan of a RUNNING persistent
        // query). Anything that doesn't open a SELECT is a query id —
        // UUID ids rejoin at '-' like TERMINATE's.
        if (p.done) p.fail("EXPLAIN needs a SELECT or a query id")
        if (p.peek.text.equalsIgnoreCase("SELECT")) ExplainStmt(parseSelect(p))
        else {
          // a UUID lexes into many tokens (hex groups split at '-' AND
          // at digit→letter boundaries: 520cd204 → '520','cd204'), so
          // rejoin — but ONLY source-ADJACENT tokens. Whitespace-
          // separated remainders ('EXPLAIN foo bar', a typo'd 'EXPLAIN
          // SELEC …') must be a parse error, not a silently fused id
          // that bypasses the trailing-token guard.
          var last = p.next()
          val sb = new StringBuilder(last.text)
          while (!p.done && p.peek.start == last.end) {
            last = p.next(); sb.append(last.text)
          }
          if (!p.done)
            p.fail(s"unexpected token '${p.peek.text}' after EXPLAIN id " +
              s"'$sb' (EXPLAIN takes a SELECT or ONE query id)")
          ExplainQuery(sb.toString)
        }
      } else Query(parseSelect(p))
    // a statement must consume its whole input — trailing tokens mean a
    // clause was silently dropped (the worst failure mode for a dialect)
    if (!p.done) p.fail(s"unexpected trailing token '${p.peek.text}'")
    stmt
  }

  private def parseCreateSource(p: P, isTable: Boolean, name: String,
                                ifNotExists: Boolean, orReplace: Boolean): CreateSource = {
    p.expect("(")
    val cols = Seq.newBuilder[(String, String)]
    while (!p.accept(")")) {
      if (p.done) p.fail("expected ) closing the column list")
      val cname = p.next().text
      val sb = new StringBuilder(p.next().text)
      // composite types: ARRAY<...>, MAP<...,...>, STRUCT<f T, ...>,
      // DECIMAL(p,s). Adjacent word tokens keep a space so STRUCT
      // field declarations ("a INT") survive re-joining.
      if (p.peekUp == "<" || p.peekUp == "(") {
        var depth = 0
        var go = true
        while (go) {
          val t = p.next().text
          if (sb.nonEmpty && sb.last.isLetterOrDigit
            && t.headOption.exists(_.isLetterOrDigit)) sb.append(' ')
          sb.append(t)
          if (t == "<" || t == "(") depth += 1
          if (t == ">" || t == ")") depth -= 1
          go = depth > 0
        }
      }
      cols += (cname -> sb.toString)
      p.accept(",")
      // swallow KEY / PRIMARY KEY column modifiers
      if (p.accept("PRIMARY")) { p.expect("KEY"); p.accept(",") }
      else if (p.accept("KEY")) p.accept(",")
    }
    val props = Map.newBuilder[String, String]
    if (p.accept("WITH")) {
      p.expect("(")
      while (!p.accept(")")) {
        if (p.done) p.fail("expected ) closing WITH properties")
        val k = p.next().up
        p.expect("=")
        props += (k -> p.next().text)
        p.accept(",")
      }
    }
    CreateSource(isTable, name, cols.result(), props.result(), ifNotExists, orReplace)
  }

  /** Collect raw expression tokens until a top-level keyword/terminator. */
  private def exprUntil(p: P, stops: Set[String]): String = {
    val sb = new StringBuilder
    var depth = 0
    while (!p.atEnd && {
      val t = p.peek
      val u = t.up
      !(depth == 0 && !t.isString && (stops.contains(u) || u == ";"))
    }) {
      val t = p.next()
      if (!t.isString && (t.text == "(" || t.text == "[")) depth += 1
      if (!t.isString && (t.text == ")" || t.text == "]")) {
        if (depth == 0) p.fail(s"unbalanced ${t.text}")
        depth -= 1
      }
      // the deref arrow glues tight on both sides (s->f), matching the
      // rewriter's tight-form structDeref rule; dots glue too, so
      // qualified names ("e.col") and decimal literals render tight
      val glue = !t.isString && (t.text == "->" || t.text == ".")
      if (glue && sb.nonEmpty && sb.last == ' ') sb.deleteCharAt(sb.length - 1)
      val afterGlue = sb.nonEmpty && (sb.last == '.' ||
        (sb.last == '>' && sb.length >= 2 &&
          sb.charAt(sb.length - 2) == '-'))
      if (sb.nonEmpty && !glue && !afterGlue) sb.append(' ')
      if (t.isString) sb.append('\'').append(t.text.replace("'", "''")).append('\'')
      else sb.append(t.text)
    }
    sb.toString
  }

  private val selectStops = Set("FROM", "WHERE", "WINDOW", "GROUP", "HAVING",
    "PARTITION", "EMIT", "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "ON",
    "WITHIN", ",", ")", "ORDER", "LIMIT")

  private def parseSelect(p: P): SelectStmt = {
    p.expect("SELECT")
    val cols = Seq.newBuilder[(String, Option[String])]
    var more = true
    while (more) {
      val e = exprUntilCol(p)
      val alias = if (p.accept("AS")) Some(p.next().text) else None
      cols += (e -> alias)
      more = p.accept(",")
    }
    p.expect("FROM")
    // derived table: FROM ( SELECT ... ) [alias]
    val fromSub = if (p.accept("(")) {
      val sub = parseSelect(p)
      p.expect(")")
      Some(sub)
    } else None
    val from = if (fromSub.isDefined) {
      if (!p.peek.isString && !selectStops.contains(p.peekUp)
        && p.peekUp.headOption.exists(_.isLetter)) p.next().text else "__sub"
    } else p.next().text
    val fromAlias = if (fromSub.isEmpty && !p.peek.isString
      && !selectStops.contains(p.peekUp) && p.peekUp.headOption.exists(_.isLetter))
      Some(p.next().text) else None

    // any number of JOIN clauses, applied left-to-right (star joins)
    val joins = Seq.newBuilder[JoinClause]
    var moreJoins = true
    while (moreJoins) {
      val jt = if (p.accept("INNER")) Some("inner")
        else if (p.accept("LEFT")) { p.accept("OUTER"); Some("left") }
        else if (p.accept("RIGHT")) { p.accept("OUTER"); Some("right") }
        else if (p.accept("FULL")) { p.accept("OUTER"); Some("full_outer") }
        else if (p.peekUp == "JOIN") Some("inner") else None
      jt match {
        case None => moreJoins = false
        case Some(joinType) =>
          p.expect("JOIN")
          val t = p.next().text
          val ta = if (!p.peek.isString && !selectStops.contains(p.peekUp)
            && p.peekUp.headOption.exists(_.isLetter)) Some(p.next().text) else None
          // WITHIN d (symmetric, KSQL default) or WITHIN (before, after)
          val within = if (p.accept("WITHIN")) Some {
            if (p.accept("(")) {
              val before = parseDuration(p); p.expect(",")
              val after = parseDuration(p); p.expect(")")
              (before, after)
            } else { val d = parseDuration(p); (d, d) }
          } else None
          p.expect("ON")
          // ksqlDB 0.14+ join conditions are a single equality whose
          // sides may be EXPRESSIONS (ON a % 2 = abs(b)) — scan each
          // side as an expression: left to the top-level '=', right to
          // the next clause keyword. Table-side joins still validate
          // down to the PRIMARY KEY column in the translator.
          val l = exprUntil(p, Set("="))
          p.expect("=")
          val r = exprUntil(p, selectStops)
          joins += JoinClause(joinType, t, ta, within, l, r)
      }
    }

    val where = if (p.accept("WHERE")) Some(exprUntil(p, selectStops - ",")) else None
    // optional trailing options inside the window parens, in any order:
    // ", GRACE PERIOD d" — KSQL's bound on how late out-of-order rows
    // may arrive (the watermark delay in Spark terms) — and
    // ", RETENTION d" — how long the windowed state keeps closed
    // windows queryable. Retention carries through to the translator:
    // batch (pull) reads of a windowed table drop windows older than
    // retention behind the source's event-time high-water mark — the
    // ksqlDB "old windows are no longer queryable" contract.
    def grace(): (Option[Long], Option[Long]) = {
      var g: Option[Long] = None
      var r: Option[Long] = None
      while (p.accept(",")) {
        if (p.accept("RETENTION")) r = Some(parseDuration(p))
        else { p.expect("GRACE"); p.expect("PERIOD"); g = Some(parseDuration(p)) }
      }
      (g, r)
    }
    val window = if (p.accept("WINDOW")) Some {
      if (p.accept("TUMBLING")) {
        p.expect("("); p.expect("SIZE"); val d = parseDuration(p)
        val (g, r) = grace(); p.expect(")")
        Tumbling(d, g, r)
      } else if (p.accept("HOPPING")) {
        p.expect("("); p.expect("SIZE"); val d = parseDuration(p)
        p.expect(","); p.expect("ADVANCE"); p.expect("BY")
        val a = parseDuration(p)
        val (g, r) = grace(); p.expect(")")
        Hopping(d, a, g, r)
      } else {
        p.expect("SESSION")
        p.expect("("); val d = parseDuration(p)
        val (g, r) = grace(); p.expect(")")
        Session(d, g, r)
      }
    } else None
    // GROUP BY ROLLUP(a, b) / CUBE(a, b) / GROUPING SETS ((a, b), (a),
    // ()) — hierarchical / full / explicit grouping sets, parsed as a
    // mode flag over the plain key list (the translator plans them
    // through Spark's rollup/cube/groupingSets, and a registered
    // per-key materialized view serves the resulting Expand-shaped
    // aggregate via the grouping-sets rewrite)
    var groupingMode: Option[String] = None
    var groupingSets = Seq.empty[Seq[String]]
    val groupBy = if (p.accept("GROUP")) {
      p.expect("BY")
      // mode keywords commit only when their full shape follows —
      // ROLLUP/CUBE must be followed by '(', GROUPING by SETS '(' — so a
      // plain grouping column that happens to be NAMED rollup/cube/
      // grouping (legal: they are not reserved here) still parses as a
      // key list (round-14 ADVICE: accept("ROLLUP") alone consumed such
      // a column and the forced '(' failed)
      def tokAt(off: Int): String = {
        val i = p.pos + off
        if (i < p.toks.length && !p.toks(i).isString) p.toks(i).up else ""
      }
      if (!p.peek.isString && p.peekUp == "ROLLUP" && tokAt(1) == "(") {
        p.next(); groupingMode = Some("rollup")
      } else if (!p.peek.isString && p.peekUp == "CUBE" && tokAt(1) == "(") {
        p.next(); groupingMode = Some("cube")
      } else if (!p.peek.isString && p.peekUp == "GROUPING" &&
          tokAt(1) == "SETS" && tokAt(2) == "(") {
        p.next(); p.next(); groupingMode = Some("sets")
      }
      val gs = Seq.newBuilder[String]
      if (groupingMode.contains("sets")) {
        p.expect("(")
        val sets = Seq.newBuilder[Seq[String]]
        var m = true
        while (m) {
          p.expect("(")
          val one = Seq.newBuilder[String]
          if (!p.accept(")")) { // "()" is the grand-total set
            var n = true
            while (n) { one += exprUntilCol(p); n = p.accept(",") }
            p.expect(")")
          }
          sets += one.result()
          m = p.accept(",")
        }
        p.expect(")")
        groupingSets = sets.result()
        // the key list is the sets' union, first-seen order — the
        // output grouping columns, like SQL's GROUPING SETS contract
        gs ++= groupingSets.flatten.distinct
      } else if (groupingMode.isDefined) {
        p.expect("(")
        var m = true
        while (m) { gs += exprUntilCol(p); m = p.accept(",") }
        p.expect(")")
      } else {
        var m = true
        while (m) { gs += exprUntilCol(p); m = p.accept(",") }
      }
      gs.result()
    } else Seq.empty
    val having = if (p.accept("HAVING")) Some(exprUntil(p, selectStops - ",")) else None
    val partitionBy = if (p.accept("PARTITION")) { p.expect("BY"); Some(p.next().text) } else None
    val orderBy = if (p.accept("ORDER")) {
      p.expect("BY")
      val os = Seq.newBuilder[(String, Boolean)]
      var m = true
      while (m) {
        val e = exprUntil(p, selectStops ++ Set("AS", "DESC", "ASC"))
        val desc = if (p.accept("DESC")) true else { p.accept("ASC"); false }
        os += (e -> desc)
        m = p.accept(",")
      }
      os.result()
    } else Seq.empty
    // LIMIT may sit either side of EMIT CHANGES (pull queries put it
    // last; push queries write EMIT CHANGES LIMIT n)
    val limit0 = if (p.accept("LIMIT")) Some(limitOperand(p)) else None
    var emitFinal = false
    val emit = if (p.accept("EMIT")) {
      if (p.accept("FINAL")) { emitFinal = true; false }
      else { p.expect("CHANGES"); true }
    } else false
    val limit = limit0.orElse(
      if (p.accept("LIMIT")) Some(limitOperand(p)) else None)
    SelectStmt(cols.result(), from, fromAlias, joins.result(), where, window,
      groupBy, having, partitionBy, emit, fromSub, orderBy, limit, emitFinal,
      groupingMode, groupingSets)
  }

  // column-level expressions additionally stop at AS (aliases); CAST(x AS
  // INT) is safe because its AS sits inside parens (depth > 0)
  private def exprUntilCol(p: P): String = exprUntil(p, selectStops + "AS")
}
