package graft.sinks

import graft.model.{JdbcSinkSpec, SecretRef}
import org.apache.spark.sql.{DataFrame, SaveMode}

import java.sql.{Connection, DriverManager}
import java.util.Properties

/** Warehouse-shaped JDBC sink (K4/K5/K6 collapsed): the reference's
  * Snowflake/Redshift/Postgres loaders are one Spark JDBC writer plus a
  * delete+insert merge transaction.
  *
  *   - plain copy        → `df.write.jdbc` append (creates the table from
  *                         the DataFrame schema if absent, like the
  *                         loaders' create-if-not-exists DDL)
  *   - truncateBeforeWrite → DELETE FROM (portable truncate) before the copy
  *   - keyFields set     → stage the batch into `<table>_stage_<uuid>`, then
  *                         one transaction: DELETE dest rows whose keys
  *                         appear in the stage, INSERT the stage, DROP the
  *                         stage — exactly RedshiftLoader.mergeInto
  *                         (:149-184) re-expressed portably.
  *
  * Scale: the copy is distributed (one JDBC connection per partition); the
  * merge transaction is delegated to the target database exactly like the
  * reference — the warehouse is the right place to reconcile keys it owns.
  */
object JdbcSink {

  def write(df: DataFrame, spec: JdbcSinkSpec): Unit = {
    val props = connProps(spec)
    runSql(spec, spec.preSql)
    if (spec.columnTypes.nonEmpty && !tableExists(spec)) createTyped(df, spec)
    if (spec.keyFields.nonEmpty && tableExists(spec)) mergeInto(df, spec, props)
    else {
      if (spec.truncateBeforeWrite && tableExists(spec))
        withConnection(spec) { c =>
          exec(c, s"DELETE FROM ${spec.table}")
        }
      df.write.mode(SaveMode.Append).jdbc(SecretRef.resolve(spec.url), spec.table, props)
    }
    runSql(spec, spec.postSql)
  }

  private def runSql(spec: JdbcSinkSpec, stmts: Seq[String]): Unit =
    if (stmts.nonEmpty) withConnection(spec) { c =>
      stmts.foreach(s => exec(c, s.replace("@table", spec.table)))
    }

  /** CREATE TABLE with verbatim per-warehouse column types for the named
    * columns (VARIANT/SUPER/json/...); unnamed columns get a portable
    * default mapping. Spark's own `createTableColumnTypes` only accepts
    * Spark SQL types, so warehouse-native types need engine-side DDL.
    */
  private def createTyped(df: DataFrame, spec: JdbcSinkSpec): Unit = {
    import org.apache.spark.sql.types._
    def defaultType(dt: DataType): String = dt match {
      case IntegerType => "INTEGER"
      case LongType => "BIGINT"
      case ShortType | ByteType => "SMALLINT"
      case DoubleType => "DOUBLE"
      case FloatType => "REAL"
      case BooleanType => "BOOLEAN"
      case TimestampType => "TIMESTAMP"
      case DateType => "DATE"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case _ => "VARCHAR(4000)"
    }
    val cols = df.schema.fields.map { f =>
      val t = spec.columnTypes.getOrElse(f.name, defaultType(f.dataType))
      s"${q(f.name)} $t"
    }
    withConnection(spec) { c =>
      exec(c, s"CREATE TABLE ${spec.table} (${cols.mkString(", ")})")
    }
  }

  private def mergeInto(df: DataFrame, spec: JdbcSinkSpec, props: Properties): Unit = {
    val stage = s"${spec.table}_stage_${java.util.UUID.randomUUID.toString.take(8)}"
    df.write.mode(SaveMode.ErrorIfExists).jdbc(SecretRef.resolve(spec.url), stage, props)
    val cols = df.columns
    withConnection(spec) { c =>
      c.setAutoCommit(false)
      try {
        // Spark's JDBC writer emits the table name UNQUOTED (the database
        // applies its case folding) but quotes COLUMN names verbatim — the
        // merge SQL must match, or case-folding databases (Derby, Postgres)
        // can't resolve the identifiers.
        val keyMatch = spec.keyFields
          .map(k => s"$stage.${q(k)} = ${spec.table}.${q(k)}")
          .mkString(" AND ")
        exec(c, s"DELETE FROM ${spec.table} WHERE EXISTS " +
          s"(SELECT 1 FROM $stage WHERE $keyMatch)")
        val colList = cols.map(q).mkString(", ")
        exec(c, s"INSERT INTO ${spec.table} ($colList) SELECT $colList FROM $stage")
        c.commit()
      } catch {
        case e: Throwable => c.rollback(); throw e
      } finally {
        c.setAutoCommit(true)
        try exec(c, s"DROP TABLE $stage") catch { case _: java.sql.SQLException => }
      }
    }
  }

  def tableExists(spec: JdbcSinkSpec): Boolean =
    withConnection(spec) { c =>
      val rs = c.getMetaData.getTables(null, null, null, Array("TABLE"))
      try {
        var found = false
        while (!found && rs.next())
          found = rs.getString("TABLE_NAME").equalsIgnoreCase(stripSchema(spec.table))
        found
      } finally rs.close()
    }

  private def stripSchema(table: String): String = table.split('.').last

  /** Quote an identifier (schema-qualified names quote each part). */
  private def q(ident: String): String =
    ident.split('.').map(p => "\"" + p + "\"").mkString(".")

  private def connProps(spec: JdbcSinkSpec): Properties = {
    val p = new Properties()
    // ${env:}/${file:} indirection resolves at connection time too, so
    // programmatically-built specs get the same treatment as loaded JSON
    spec.user.foreach(u => p.setProperty("user", SecretRef.resolve(u)))
    spec.password.foreach(pw => p.setProperty("password", SecretRef.resolve(pw)))
    spec.driver.foreach(p.setProperty("driver", _))
    p
  }

  private def withConnection[A](spec: JdbcSinkSpec)(f: Connection => A): A = {
    spec.driver.foreach(Class.forName)
    val c = DriverManager.getConnection(SecretRef.resolve(spec.url),
      spec.user.map(SecretRef.resolve(_)).orNull,
      spec.password.map(SecretRef.resolve(_)).orNull)
    try f(c) finally c.close()
  }

  private def exec(c: Connection, sql: String): Unit = {
    val st = c.createStatement()
    try st.executeUpdate(sql): Unit finally st.close()
  }
}
