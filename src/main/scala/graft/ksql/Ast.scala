package graft.ksql

/** AST for the KSQL statement subset (SURVEY.md §2.12).
  *
  * Expressions are carried as token streams rather than a full expression
  * tree: KSQL expression syntax is close enough to Spark SQL that the
  * translator only rewrites function names / operators and passes the
  * rest through Catalyst's own parser — one less parser to get wrong.
  */
sealed trait WindowSpec {
  def graceMs: Option[Long]
  def retentionMs: Option[Long]
}
case class Tumbling(sizeMs: Long, graceMs: Option[Long] = None,
                    retentionMs: Option[Long] = None) extends WindowSpec
case class Hopping(sizeMs: Long, advanceMs: Long,
                   graceMs: Option[Long] = None,
                   retentionMs: Option[Long] = None) extends WindowSpec
case class Session(gapMs: Long, graceMs: Option[Long] = None,
                   retentionMs: Option[Long] = None) extends WindowSpec

case class JoinClause(
    joinType: String,            // INNER | LEFT
    table: String,
    alias: Option[String],
    withinMs: Option[(Long, Long)], // stream-stream bound (before, after);
                                    // WITHIN d = (d, d), KSQL symmetric
    onLeft: String, onRight: String)

case class SelectStmt(
    columns: Seq[(String, Option[String])],   // (exprSql, alias)
    from: String,                             // name, or alias when fromSub set
    fromAlias: Option[String],
    joins: Seq[JoinClause],                   // applied left-to-right (star joins)
    where: Option[String],
    window: Option[WindowSpec],
    groupBy: Seq[String],
    having: Option[String],
    partitionBy: Option[String],
    emitChanges: Boolean,
    fromSub: Option[SelectStmt] = None,       // derived table: FROM (SELECT ...)
    orderBy: Seq[(String, Boolean)] = Seq.empty, // (expr, descending)
    limit: Option[Int] = None,
    emitFinal: Boolean = false, // EMIT FINAL: only closed windows (append mode)
    groupingMode: Option[String] = None, // ROLLUP(...)/CUBE(...)/GROUPING SETS
    groupingSets: Seq[Seq[String]] = Seq.empty) // the sets, when mode = sets

sealed trait Statement
case class CreateSource(
    isTable: Boolean, name: String,
    columns: Seq[(String, String)],           // (name, ksqlType)
    props: Map[String, String],               // WITH(...) normalized keys
    ifNotExists: Boolean = false,             // keep an existing binding
    orReplace: Boolean = false) extends Statement // force a fresh binding
case class CreateAsSelect(
    isTable: Boolean, name: String, select: SelectStmt,
    props: Map[String, String] = Map.empty,   // WITH(...)
    ifNotExists: Boolean = false) extends Statement
case class InsertInto(target: String, select: SelectStmt) extends Statement
case class InsertValues(target: String, columns: Seq[String],
                        values: Seq[String]) extends Statement // literal row
case class PrintRows(source: String, limit: Int,
    interval: Int = 1,                 // INTERVAL n: every nth record
    fromBeginning: Boolean = false     // accepted for KSQL syntax parity
) extends Statement // PRINT name [FROM BEGINNING] [INTERVAL n] [LIMIT n]
case class Query(select: SelectStmt) extends Statement
case class ShowSources(tables: Boolean) extends Statement   // SHOW STREAMS|TABLES
case class Describe(name: String, extended: Boolean = false) extends Statement
case class DropSource(name: String, ifExists: Boolean) extends Statement
case class ExplainStmt(select: SelectStmt) extends Statement
case class ExplainQuery(id: String) extends Statement  // EXPLAIN <queryId>
case object ShowQueries extends Statement                   // SHOW QUERIES
case class Terminate(id: String) extends Statement          // TERMINATE <id>|ALL
case class Pause(id: String) extends Statement              // PAUSE <id>|ALL
case class Resume(id: String) extends Statement             // RESUME <id>|ALL
case class AssertExists(                                    // ASSERT [NOT EXISTS] ...
    kind: String,             // TOPIC | STREAM | TABLE | SCHEMA
    name: String,             // source name, or registry SUBJECT for SCHEMA
    registry: Option[String], // SCHEMA: REGISTRY 'dir' (else session property)
    notExists: Boolean,
    timeoutMs: Long) extends Statement
case class RunScript(path: String) extends Statement        // RUN SCRIPT '<path>'
case class SetProp(key: String, value: String) extends Statement  // SET 'k'='v'
case class UnsetProp(key: String) extends Statement         // UNSET 'k'
case object ShowProperties extends Statement                // SHOW PROPERTIES
case object ShowFunctions extends Statement                 // SHOW FUNCTIONS
case class DescribeFunction(name: String) extends Statement // DESCRIBE FUNCTION f
case class DefineVar(name: String, value: String) extends Statement // DEFINE v='x'
case class UndefineVar(name: String) extends Statement      // UNDEFINE v
case object ShowVariables extends Statement                 // SHOW VARIABLES
case class CreateType(name: String, typeSql: String) extends Statement // CREATE TYPE t AS ...
case class DropType(name: String, ifExists: Boolean) extends Statement // DROP TYPE t
case object ShowTypes extends Statement                     // SHOW TYPES
case object ShowMaterializedViews extends Statement // SHOW MATERIALIZED VIEWS
// CREATE MATERIALIZED VIEW name WITH (STATE_DIR='…', DELTA='<pred>')
//   AS SELECT … FROM src [WHERE …] GROUP BY … — registers the optimizer
// MV-rewrite serving plan (state ⊎ delta) for the SELECT's aggregate
// shape; the state artifact is built once (single-writer) if absent
case class CreateMaterializedView(name: String,
    props: Map[String, String], select: SelectStmt,
    ifNotExists: Boolean = false) extends Statement
case class DropMaterializedView(name: String,
    ifExists: Boolean) extends Statement
// REFRESH MATERIALIZED VIEW name WITH (STATE_DIR='…', DELTA='<pred>'
//   [, DELETED='<pred>']) — advance the view's cutoff (and optionally
// fold upstream retractions) into a FRESH state artifact: the receiving
// server folds single-writer; replaying servers find the artifact built
// and re-pin their registration without re-folding (the maintenance
// half of the MV lifecycle, replicated like the create)
case class RefreshMaterializedView(name: String,
    props: Map[String, String]) extends Statement
// Connector management (ksqlDB's CREATE SOURCE/SINK CONNECTOR — proxied
// to Kafka Connect by the real server; served by graft's embedded
// file-connector runtime, see Connectors.scala)
case class CreateConnector(isSource: Boolean, name: String,
    props: Map[String, String],
    ifNotExists: Boolean = false) extends Statement
case object ShowConnectors extends Statement                // SHOW CONNECTORS
case class DescribeConnector(name: String) extends Statement
case class DropConnector(name: String, ifExists: Boolean) extends Statement
