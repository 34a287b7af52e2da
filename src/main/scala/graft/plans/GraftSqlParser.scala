package graft.plans

import java.nio.file.Paths

import graft.operators.{Compaction, Vacuum, ZOrder}
import graft.sinks.{ObjectStoreSink, TableManifest}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

/** SQL surface for table maintenance — the statements a lakehouse user
  * expects to type (the reference's warehouse exposed the same verbs:
  * Athena Iceberg `OPTIMIZE table REWRITE DATA` and `VACUUM table`,
  * AthenaUtil.scala:61-160), parsed in front of Spark's own parser and
  * executed through the engine's maintenance operators:
  *
  *   OPTIMIZE <db.table> [ZORDER BY (c1, c2, …)] [TARGET <n> BYTES]
  *   VACUUM <db.table> [KEEP <n>]
  *   SHOW SNAPSHOTS <db.table>
  *
  * Everything else — including any parse ambiguity — falls through to the
  * delegate parser verbatim, so the dialect is purely additive. Commands
  * are lazy [[LeafRunnableCommand]]s: parsing builds a plan, execution
  * runs the operator (Compaction / ZOrder+commit / Vacuum / snapshot
  * inventory) and returns its report as rows. Injected at session-build
  * time by [[graft.GraftExtensions]] (parsers, unlike optimizer rules,
  * cannot be added to an already-built session).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case OptimizeRe(ident, _, zcols, _, target) =>
      val (db, t) = split(ident)
      orDelegate(db, t, sqlText)(OptimizeTableCommand(db, t,
        Option(zcols).toSeq.flatMap(_.split(',').map(_.trim).filter(_.nonEmpty)),
        Option(target).map(_.toLong).getOrElse(128L << 20)))
    case VacuumRe(ident, _, keep) =>
      val (db, t) = split(ident)
      orDelegate(db, t, sqlText)(
        VacuumTableCommand(db, t, Option(keep).map(_.toInt).getOrElse(2)))
    case SnapshotsRe(ident) =>
      val (db, t) = split(ident)
      orDelegate(db, t, sqlText)(ShowSnapshotsCommand(db, t))
    case _ => delegate.parsePlan(sqlText)
  }

  /** The maintenance command when the named table is (or could be) ours;
    * the DELEGATE parser's plan when the table exists but provably does
    * not follow the versioned layout — a co-installed extension owning
    * the same verbs for its own tables must not be shadowed (r11 ADVICE).
    * A missing table or an unprobeable state keeps OUR command, which
    * fails loudly and informatively at run time instead of surfacing a
    * confusing parse error.
    */
  private def orDelegate(db: Option[String], table: String,
      sqlText: String)(cmd: => LogicalPlan): LogicalPlan = {
    val foreign = SparkSession.getActiveSession.exists { s =>
      try {
        ObjectStoreSink.specFor(s,
          db.getOrElse(s.catalog.currentDatabase), table)
        false
      } catch {
        case _: graft.model.PipelineSpecException => true // not our layout
        case _: Exception => false // missing table/catalog: ours, loud later
      }
    }
    if (foreign) delegate.parsePlan(sqlText) else cmd
  }

  private def split(ident: String): (Option[String], String) =
    ident.split('.') match {
      case Array(d, t) => (Some(d), t)
      case Array(t) => (None, t)
      case _ => throw new IllegalArgumentException(
        s"maintenance commands take db.table or table, got: $ident")
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  // strict shapes only — anything else falls through to Spark. Identifiers
  // are plain (no backticks): the protocol's own database/table naming.
  private val Ident = """([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)?)"""
  private val OptimizeRe =
    ("""(?is)\s*OPTIMIZE\s+""" + Ident +
      """(\s+ZORDER\s+BY\s*\(([^)]+)\))?(\s+TARGET\s+(\d+)\s+BYTES)?\s*;?\s*""").r
  private val VacuumRe =
    ("""(?is)\s*VACUUM\s+""" + Ident + """(\s+KEEP\s+(\d+))?\s*;?\s*""").r
  private val SnapshotsRe =
    ("""(?is)\s*SHOW\s+SNAPSHOTS\s+""" + Ident + """\s*;?\s*""").r

  private def resolveSpec(spark: SparkSession, db: Option[String],
      table: String) = {
    val database = db.getOrElse(spark.catalog.currentDatabase)
    (database, ObjectStoreSink.specFor(spark, database, table))
  }

  private def attr(name: String, dt: DataType): AttributeReference =
    AttributeReference(name, dt, nullable = false)()

  /** `OPTIMIZE`: bin-pack rewrite toward `targetBytes` files, or — with
    * ZORDER BY — a Morton-ordered re-layout committed through the same
    * CAS-guarded versioned protocol as [[Compaction]] (the pinned
    * snapshot's txn stamp rides through so streaming-MV replay guards see
    * maintenance as invisible).
    */
  final case class OptimizeTableCommand(db: Option[String], table: String,
      zorderBy: Seq[String], targetBytes: Long) extends LeafRunnableCommand {

    override val output: Seq[Attribute] = Seq(
      attr("action", StringType), attr("files_before", IntegerType),
      attr("files_after", IntegerType), attr("bytes_total", LongType))

    override def run(spark: SparkSession): Seq[Row] = {
      val (_, spec) = resolveSpec(spark, db, table)
      val before = Compaction.liveFileCount(spark, spec)
      val bytes = Compaction.liveBytes(spark, spec)
      if (zorderBy.isEmpty) {
        val after = Compaction.compact(spark, spec, targetBytes)
        Seq(Row("compact", before, after, bytes))
      } else {
        // pin ONE committed snapshot; CAS on it still being latest and
        // carry its txn stamp — the Compaction.compact concurrency rules
        val snap = ObjectStoreSink.snapshots(spec).lastOption.getOrElse(
          throw new graft.model.PipelineSpecException(
            s"${spec.database}.${spec.table} has no committed version"))
        val stamp = TableManifest.read(Paths.get(snap.path)).flatMap(_.txn)
        val nFiles = math.max(1,
          math.ceil(bytes.toDouble / targetBytes).toInt)
        val df = ObjectStoreSink.readVersion(spark, spec, Some(snap.version))
        ObjectStoreSink.replaceTable(spark,
          ZOrder.layout(df, zorderBy, nFiles), spec,
          txn = stamp, expectVersion = Some(snap.version))
        val after = Compaction.liveFileCount(spark, spec)
        Seq(Row("zorder", before, after, bytes))
      }
    }
  }

  /** `VACUUM`: retire this table's superseded versions past the keep
    * count and reader-safety grace — [[Vacuum.vacuumTable]].
    */
  final case class VacuumTableCommand(db: Option[String], table: String,
      keep: Int) extends LeafRunnableCommand {

    override val output: Seq[Attribute] = Seq(
      attr("versions_retired", IntegerType), attr("bytes_freed", LongType))

    override def run(spark: SparkSession): Seq[Row] = {
      val (database, spec) = resolveSpec(spark, db, table)
      val tableDir = Paths.get(spec.path, database, table)
      val r = Vacuum.vacuumTable(tableDir, keep)
      Seq(Row(r.versionsRetired, r.bytesFreed))
    }
  }

  /** `SHOW SNAPSHOTS`: the committed-version inventory, oldest → newest —
    * metadata only, no data access.
    */
  final case class ShowSnapshotsCommand(db: Option[String],
      table: String) extends LeafRunnableCommand {

    override val output: Seq[Attribute] = Seq(
      attr("version", IntegerType), attr("committed_at_ms", LongType),
      attr("row_count", LongType), attr("total_bytes", LongType),
      attr("n_files", IntegerType), attr("live", BooleanType))

    override def run(spark: SparkSession): Seq[Row] = {
      val (_, spec) = resolveSpec(spark, db, table)
      ObjectStoreSink.snapshots(spec).map(s =>
        Row(s.version, s.committedAtMs, s.rowCount, s.totalBytes,
          s.nFiles, s.live))
    }
  }
}
