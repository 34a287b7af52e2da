package graft.cdc

import graft.model.JdbcSourceSpec
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S12: MSSQL-native-style CDC polling (reference MSSqlCDCRunner.scala:32-116
  * + MsSqlCDCRunnerSlave.scala:34-187), generalized to any JDBC change table
  * carrying the SQL Server CDC shape:
  *
  *   `__$operation` int — 1=delete, 2=insert, 3=update-before, 4=update-after
  *   `__$seqval`    — change sequence (orders events; pairs update halves)
  *   + the captured table's columns.
  *
  * Each poll reads only rows past the stored watermark (pushdown subquery),
  * pairs op-3/op-4 halves on `__$seqval` (J4), and emits normalized
  * [[CDCMessage]] rows. The watermark advances to the batch's max seqval.
  */
object MsSqlStyleCdc {

  final case class PollResult(messages: Dataset[CDCMessage], rows: Long)

  def poll(spark: SparkSession, dataset: String, spec: JdbcSourceSpec,
      store: WatermarkStore, database: String = "", schema: String = "",
      table: String = ""): PollResult = {
    import spark.implicits._
    val wm = store.get(dataset)
    val where = wm.map(w => s" WHERE \"__$$seqval\" > $w").getOrElse("")
    val reader = spark.read.format("jdbc")
      .option("url", spec.url)
      .option("dbtable", s"(SELECT * FROM ${spec.table}$where) cdc_q")
    spec.driver.foreach(reader.option("driver", _))
    spec.user.foreach(reader.option("user", _))
    spec.password.foreach(reader.option("password", _))
    val raw = reader.load()
    val cols = raw.columns.filterNot(_.startsWith("__$"))

    // generic row → (op, seqval, values-map-as-strings); map keys lowercased
    // to the engine's header convention (case-folding databases return
    // uppercase column names)
    val events = raw.select(
      col("__$operation").cast("int").as("op"),
      col("__$seqval").cast("long").as("seqval"),
      map(cols.flatMap(c =>
        Seq(lit(c.toLowerCase), col(c).cast("string"))).toIndexedSeq: _*).as("vals"))

    // J4: pair the update before/after halves on seqval; singles pass through
    val paired = events.groupBy("seqval").agg(
      collect_list(struct(col("op"), col("vals"))).as("evs"))
      .as[(Long, Seq[(Int, Map[String, String])])]
      .flatMap { case (seqval, evs) =>
        val byOp = evs.toMap
        if (byOp.contains(3) || byOp.contains(4))
          Some(CDCMessage(database, schema, table,
            isInsert = false, isUpdate = true, isDelete = false,
            before = byOp.getOrElse(3, Map.empty),
            after = byOp.getOrElse(4, Map.empty), seq = seqval))
        else evs.headOption.map { case (op, vals) =>
          CDCMessage(database, schema, table,
            isInsert = op == 2, isUpdate = false, isDelete = op == 1,
            before = if (op == 1) vals else Map.empty,
            after = if (op == 2) vals else Map.empty, seq = seqval)
        }
      }

    val rows = paired.count()
    if (rows > 0) {
      val maxSeq = paired.agg(max(col("seq"))).collect()(0).getLong(0)
      store.set(dataset, maxSeq.toString)
    }
    PollResult(paired, rows)
  }
}
