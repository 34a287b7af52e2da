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
  * [[CDCMessage]] rows. The watermark candidate is the batch's max seqval;
  * it is persisted by the caller via [[PollResult.commit]] only after the
  * batch is applied.
  */
object MsSqlStyleCdc {

  /** One polled change batch. `messages` is a materialized snapshot
    * (JdbcPull.snapshot): count, max-seqval and the caller's apply all read the
    * SAME rows from one JDBC trip — a live change table polled three times
    * would yield three different snapshots, acknowledging events that were
    * never applied. `newWatermark` is a CANDIDATE; the caller invokes
    * [[PollResult.commit]] only after applying the batch, so an apply
    * failure re-delivers the same window on the next poll.
    */
  final case class PollResult(messages: Dataset[CDCMessage], rows: Long,
      newWatermark: Option[String]) {
    def commit(store: WatermarkStore, dataset: String): Unit =
      if (rows > 0) newWatermark.foreach(store.set(dataset, _))
  }

  def poll(spark: SparkSession, dataset: String, spec: JdbcSourceSpec,
      store: WatermarkStore, database: String = "", schema: String = "",
      table: String = ""): PollResult = {
    import spark.implicits._
    val wm = store.get(dataset)
    // interpolated into the pushdown subquery — must be a bare sequence number
    wm.foreach(w => require(w.matches("-?[0-9]+"),
      s"dataset $dataset: stored watermark '$w' is not a sequence number"))
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

    // one snapshot, one pass: the change table is read once; count and
    // max-seq come from the same materialized rows the caller will apply
    // (lineage-cut + CacheManager persist — see JdbcPull.snapshot)
    val snap = JdbcPull.snapshot(paired.toDF())
      .as[CDCMessage](org.apache.spark.sql.Encoders.product[CDCMessage])
    val agg = snap.agg(count(lit(1)).as("n"), max(col("seq")).as("mx")).collect()(0)
    val rows = agg.getLong(0)
    val maxSeq = if (rows > 0) Some(agg.getLong(1).toString) else None
    PollResult(snap, rows, maxSeq)
  }
}
