package graft.queries

import graft.model._
import graft.runtime.Pipeline
import graft.dq.DataQualityRunner
import graft.sinks.JdbcSink
import graft.sources.FileSources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries over the PIPELINE ENGINE itself (the round-2
  * spine): each runs a real config-driven pipeline (or one of its
  * operators) over the committed CSV fixtures and exposes the landed result
  * for the DuckDB hash-compare. The oracle reads the same CSV with
  * `read_csv` and replays the declared semantics in SQL.
  *
  * These queries ignore `sfDir` by design — their input is the fixture
  * corpus the reference itself ships (FIXTURES.md §1).
  */
object PipelineQueries {

  private val FixtureDir = "/root/repo/fixtures"
  private val BigCsv = s"$FixtureDir/stock_price.20170102.dataset.csv"
  private val SmallCsv = s"$FixtureDir/stock_price.20170102.small.dataset.csv"

  private val stockFields = Seq("symbol" -> "string", "date" -> "string",
    "open" -> "double", "high" -> "double", "low" -> "double",
    "close" -> "double", "volume" -> "int", "adj_close" -> "double")
    .map { case (n, t) => FieldSpec(n, t) }

  /** DuckDB read_csv with the stock schema as all-VARCHAR (same as the
    * engine's pre-cast string read).
    */
  private def srcSql(path: String): String = {
    val cols = stockFields.map(f => s"'${f.name}':'VARCHAR'").mkString("{", ",", "}")
    s"read_csv('$path', header=true, columns=$cols)"
  }

  private def freshLake(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag-").toString

  val defs: Seq[QueryDef] = Seq(

    // ---- the flagship: full config-driven pipeline, end to end ------------
    // read CSV → header-validate → warn-level DQ → dedup → script row
    // function (drop FAX, adj_close+1, add year + mynewcolumn) → cast to
    // destination schema → partitioned parquet + catalog → SQL over the
    // landed table.
    QueryDef(
      "q_pipeline_e2e",
      (s, _) => {
        val spec = PipelineSpec(
          name = "q_pipeline_e2e",
          source = SourceSpec(schema = stockFields,
            file = Some(FileSpec(csv = Some(CsvSpec())))),
          dataQuality = Some(DataQualitySpec(
            validateFileHeader = true,
            columnRules = Seq(
              ColumnRuleSpec("symbol", "regex", "[a-zA-Z]+"),
              ColumnRuleSpec("volume", "regex", "[0-9]+")))),
          transformation = Some(TransformSpec(
            deduplicate = true,
            rowFunctions = Seq(RowFunctionSpec("script",
              Seq(s"$FixtureDir/stock_price_transformation.js"))))),
          destination = DestinationSpec(
            schema = stockFields ++ Seq(FieldSpec("year", "string"),
              FieldSpec("mynewcolumn", "double")),
            objectStore = Some(ObjectStoreSpec(path = freshLake("e2e"),
              database = "graft_q", table = "q_pipeline_e2e",
              partitionBy = Seq("date"), writeMode = "overwrite",
              deleteBeforeWrite = true))))
        val res = Pipeline.run(s, spec, BigCsv)
        val cols = spec.destination.schema.map(f => col(f.name))
        s.table(res.table.get)
          .select(cols: _*)
          .orderBy(cols: _*)
      },
      Some {
        val castCols =
          """symbol, date,
            |TRY_CAST(open AS DOUBLE) AS open, TRY_CAST(high AS DOUBLE) AS high,
            |TRY_CAST(low AS DOUBLE) AS low, TRY_CAST(close AS DOUBLE) AS close,
            |TRY_CAST(volume AS INTEGER) AS volume,
            |TRY_CAST(CAST(TRY_CAST(adj_close AS DOUBLE) + 1.0 AS VARCHAR) AS DOUBLE) AS adj_close,
            |CAST(year(now()) AS VARCHAR) AS year,
            |CAST(100.0 AS DOUBLE) AS mynewcolumn""".stripMargin
        s"""WITH dedup AS (SELECT DISTINCT * FROM ${srcSql(BigCsv)}),
           |kept AS (SELECT * FROM dedup WHERE symbol <> 'FAX' OR symbol IS NULL)
           |SELECT $castCols FROM kept
           |ORDER BY symbol, date, open, high, low, close, volume, adj_close, year, mynewcolumn""".stripMargin
      }),

    // ---- DQ column-rule report (§2.10) ------------------------------------
    // Rules chosen to actually fire on the big fixture: prices must have
    // exactly 2 decimals (6-decimal rows violate), volume must be < 7
    // digits. Aggregated per rule (row-number detail is covered by unit
    // tests; DuckDB here lacks a stable file-order row id).
    QueryDef(
      "q_dq_report",
      (s, _) => {
        val spec = PipelineSpec(
          name = "q_dq_report",
          source = SourceSpec(schema = stockFields,
            file = Some(FileSpec(csv = Some(CsvSpec())))),
          dataQuality = Some(DataQualitySpec(columnRules = Seq(
            ColumnRuleSpec("open", "regex", """(?:0|[1-9][0-9]*)\.[0-9]{2}""",
              onFailureIsError = false, description = "2dp price"),
            ColumnRuleSpec("volume", "regex", "[0-9]{1,6}",
              onFailureIsError = true, description = "volume<1e7"),
            ColumnRuleSpec("symbol", "regex", "[A-Z]+",
              onFailureIsError = false, description = "upper symbol")))),
          destination = DestinationSpec(
            objectStore = Some(ObjectStoreSpec(path = "/tmp/unused",
              database = "graft_q", table = "unused"))))
          .normalized.validated
        val raw = FileSources.read(s, spec, BigCsv)
        DataQualityRunner.columnRuleViolations(raw, spec)
          .groupBy("rule", "column_name", "is_error")
          .agg(count(lit(1)).as("n_violations"))
          .orderBy("column_name")
      },
      Some(
        s"""WITH src AS (SELECT * FROM ${srcSql(BigCsv)}),
           |v AS (
           |  SELECT 'open' AS column_name, FALSE AS is_error,
           |         SUM(CASE WHEN NOT regexp_full_match(COALESCE(open, ''), '(?:0|[1-9][0-9]*)\\.[0-9]{2}') THEN 1 ELSE 0 END) AS n_violations
           |  FROM src
           |  UNION ALL
           |  SELECT 'volume', TRUE,
           |         SUM(CASE WHEN NOT regexp_full_match(COALESCE(volume, ''), '[0-9]{1,6}') THEN 1 ELSE 0 END)
           |  FROM src
           |  UNION ALL
           |  SELECT 'symbol', FALSE,
           |         SUM(CASE WHEN NOT regexp_full_match(COALESCE(symbol, ''), '[A-Z]+') THEN 1 ELSE 0 END)
           |  FROM src)
           |SELECT 'regex' AS rule, column_name, is_error,
           |       CAST(n_violations AS BIGINT) AS n_violations
           |FROM v WHERE n_violations > 0 ORDER BY column_name""".stripMargin)),

    // ---- JDBC sink round-trip (K4-K6/J3) ----------------------------------
    // customer base → Derby table, then a modified batch delete+insert-merged
    // on the key, read back through the JDBC source. The oracle replays the
    // merge relationally.
    QueryDef(
      "q_jdbc_roundtrip",
      (s, d) => {
        val dbDir = freshLake("derby")
        val url = s"jdbc:derby:$dbDir/db;create=true"
        val cust = graft.Tables.load(s, d, "customer")
        val base = cust.filter(col("c_custkey") <= 500)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        val batch = cust.filter(col("c_custkey") > 400 && col("c_custkey") <= 600)
          .select(col("c_custkey"), col("c_name"),
            (col("c_acctbal") + lit(50.0)).as("c_acctbal"))
        val spec = JdbcSinkSpec(url = url, table = "cust_rt",
          keyFields = Seq("c_custkey"))
        JdbcSink.write(base, spec)
        JdbcSink.write(batch, spec) // merge path
        s.read.format("jdbc").option("url", url).option("dbtable", "cust_rt").load()
          .select(col("c_custkey").cast("bigint").as("c_custkey"), col("c_name"),
            col("c_acctbal"))
          .orderBy("c_custkey")
      },
      Some("""SELECT COALESCE(b.c_custkey, a.c_custkey) AS c_custkey,
             |       COALESCE(b.c_name, a.c_name) AS c_name,
             |       COALESCE(b.c_acctbal, a.c_acctbal) AS c_acctbal
             |FROM (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey <= 500) a
             |FULL JOIN (SELECT c_custkey, c_name, c_acctbal + 50.0 AS c_acctbal
             |           FROM customer WHERE c_custkey > 400 AND c_custkey <= 600) b
             |  ON a.c_custkey = b.c_custkey
             |ORDER BY c_custkey""".stripMargin)),

    // ---- catalog SQL over a pipeline-landed partitioned table (K1+A4) -----
    QueryDef(
      "q_catalog_sql",
      (s, _) => {
        val spec = PipelineSpec(
          name = "q_catalog_sql",
          source = SourceSpec(schema = stockFields,
            file = Some(FileSpec(csv = Some(CsvSpec())))),
          destination = DestinationSpec(
            objectStore = Some(ObjectStoreSpec(path = freshLake("cat"),
              database = "graft_q", table = "q_catalog_sql",
              partitionBy = Seq("date"), writeMode = "overwrite",
              deleteBeforeWrite = true))))
        Pipeline.run(s, spec, BigCsv)
        // partition-pruned scan: date is the partition column, so only the
        // 2017-01-02 directory is read (8 of 6003 rows)
        s.sql("""SELECT symbol, max(close) AS max_close, min(open) AS min_open,
                |       sum(volume) AS sum_volume
                |FROM graft_q.q_catalog_sql
                |WHERE date = '2017-01-02'
                |GROUP BY symbol HAVING count(*) > 0
                |ORDER BY symbol LIMIT 50""".stripMargin)
      },
      Some(s"""SELECT symbol, max(TRY_CAST(close AS DOUBLE)) AS max_close,
              |       min(TRY_CAST(open AS DOUBLE)) AS min_open,
              |       CAST(sum(TRY_CAST(volume AS INTEGER)) AS BIGINT) AS sum_volume
              |FROM ${srcSql(BigCsv)}
              |WHERE date = '2017-01-02'
              |GROUP BY symbol HAVING count(*) > 0
              |ORDER BY symbol LIMIT 50""".stripMargin)),

    // ---- multi-file union via archive expansion (S8/S2 multi-file) --------
    // The zip expands once at definition time (driver-side pre-step); Spark
    // reads the expanded files as ONE multi-path scan, and the oracle reads
    // the very same expanded files with read_csv — DuckDB can't open zip
    // members, so sharing the expansion keeps both sides on identical bytes.
    QueryDef(
      "q_archive_union",
      (s, _) => {
        val spec = PipelineSpec(
          name = "q_archive_union",
          source = SourceSpec(schema = stockFields,
            file = Some(FileSpec(csv = Some(CsvSpec())))),
          destination = DestinationSpec(objectStore = Some(
            ObjectStoreSpec(path = "/tmp/unused", database = "graft_q", table = "unused"))))
          .normalized.validated
        val df = FileSources.readCsv(s, spec, archivePaths)
        df.groupBy("date").agg(count(lit(1)).as("n"),
            countDistinct(col("symbol")).as("n_symbols"))
          .orderBy("date")
      },
      Some {
        val union = archivePaths
          .map(p => s"SELECT * FROM ${srcSql(p)}").mkString("\nUNION ALL\n")
        s"""SELECT date, COUNT(*) AS n, COUNT(DISTINCT symbol) AS n_symbols
           |FROM ($union)
           |GROUP BY date ORDER BY date""".stripMargin
      })
  )

  /** Expanded zip fixture — shared by the Spark query and its oracle. */
  private lazy val archivePaths: Seq[String] =
    graft.sources.Intake.resolve(s"$FixtureDir/stock_price.dataset.zip").paths

  /** §2.9: CDC micro-batch application, oracle-checked. A deterministic
    * change batch derived from `customer` (updates+inserts for keys
    * 800<k<=1200, deletes for k<=800 and k%97=0) applies to a customer
    * target via [[graft.cdc.CdcApply.applyBatch]]; the oracle replays it as
    * FULL JOIN + anti-filter.
    */
  val cdcDefs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_cdc_apply",
      (s, d) => {
        import s.implicits._
        val cust = graft.Tables.load(s, d, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        val target = cust.filter(col("c_custkey") <= 1000)
        val updates = cust
          .filter(col("c_custkey") > 800 && col("c_custkey") <= 1200)
          .select(col("c_custkey").cast("string").as("k"), col("c_name").as("n"),
            (col("c_acctbal") + 50.0).cast("string").as("b"))
          .as[(String, String, String)]
          .map { case (k, n, b) =>
            graft.cdc.CDCMessage("tpch", "public", "customer",
              isInsert = k.toLong > 1000, isUpdate = k.toLong <= 1000, isDelete = false,
              before = Map.empty,
              after = Map("c_custkey" -> k, "c_name" -> n, "c_acctbal" -> b),
              seq = 2L)
          }
        val deletes = cust
          .filter(col("c_custkey") <= 800 && col("c_custkey") % 97 === 0)
          .select(col("c_custkey").cast("string").as("k"))
          .as[String]
          .map(k => graft.cdc.CDCMessage("tpch", "public", "customer",
            isInsert = false, isUpdate = false, isDelete = true,
            before = Map("c_custkey" -> k), after = Map.empty, seq = 1L))
        val batch = updates.unionByName(deletes)
        graft.cdc.CdcApply.applyBatch(target, batch, Seq("c_custkey"))
          .orderBy("c_custkey")
      },
      Some("""WITH t AS (SELECT c_custkey, c_name, c_acctbal FROM customer
             |           WHERE c_custkey <= 1000),
             |u AS (SELECT c_custkey, c_name, c_acctbal + 50.0 AS c_acctbal
             |      FROM customer WHERE c_custkey > 800 AND c_custkey <= 1200),
             |m AS (SELECT COALESCE(u.c_custkey, t.c_custkey) AS c_custkey,
             |             COALESCE(u.c_name, t.c_name) AS c_name,
             |             COALESCE(u.c_acctbal, t.c_acctbal) AS c_acctbal
             |      FROM t FULL JOIN u ON t.c_custkey = u.c_custkey)
             |SELECT c_custkey, c_name, c_acctbal FROM m
             |WHERE NOT (c_custkey <= 800 AND c_custkey % 97 = 0)
             |ORDER BY c_custkey""".stripMargin))
  )
}
