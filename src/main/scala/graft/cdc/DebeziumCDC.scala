package graft.cdc

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One change event, normalized across CDC sources (reference
  * CDCMessage.scala:21-30): Debezium envelopes (S11) and MSSQL-CDC-style
  * op-coded polls (S12) both land here, as Dataset[CDCMessage] rows —
  * column values kept as strings exactly like the reference's
  * Map[String, String] before/after images.
  */
final case class CDCMessage(
    database: String,
    schema: String,
    table: String,
    isInsert: Boolean,
    isUpdate: Boolean,
    isDelete: Boolean,
    before: Map[String, String],
    after: Map[String, String],
    seq: Long)

/** S11: Debezium envelope parsing (reference DebeziumCDCRunner.scala:37-121).
  *
  * Input is a DataFrame with a `value` string column (Kafka's value / a file
  * stream's line — the envelope is transport-agnostic). Parsing runs
  * distributed via mapPartitions+json4s: Debezium's before/after are
  * per-table arbitrary structs, so a fixed `from_json` schema can't cover
  * every table on the topic-regex; a map-of-strings normalization can.
  */
object DebeziumCDC {

  def parse(envelopes: DataFrame): Dataset[CDCMessage] = {
    import envelopes.sparkSession.implicits._
    envelopes.select(col("value").cast("string")).as[String]
      .mapPartitions(_.flatMap(parseOne))
  }

  private[cdc] def parseOne(json: String): Option[CDCMessage] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    if (json == null || json.trim.isEmpty) return None
    val root = try JsonMethods.parse(json) catch { case _: Exception => return None }
    // tolerate both the full envelope {schema, payload} and a bare payload
    val payload = root \ "payload" match {
      case JNothing => root
      case p => p
    }
    val op = payload \ "op" match {
      case JString(o) => o
      case _ => return None // heartbeat / schema-change messages
    }
    def img(name: String): Map[String, String] = payload \ name match {
      case JObject(fields) => fields.collect {
        case (k, JString(v))  => k -> v
        case (k, JInt(v))     => k -> v.toString
        case (k, JLong(v))    => k -> v.toString
        case (k, JDouble(v))  => k -> v.toString
        case (k, JDecimal(v)) => k -> v.toString
        case (k, JBool(v))    => k -> v.toString
      }.toMap
      case _ => Map.empty
    }
    val source = payload \ "source"
    def srcStr(k: String): String = source \ k match {
      case JString(s) => s
      case _ => ""
    }
    val seq = payload \ "ts_ms" match {
      case JInt(v) => v.toLong
      case JLong(v) => v
      case _ => 0L
    }
    Some(CDCMessage(
      database = srcStr("db"), schema = srcStr("schema"), table = srcStr("table"),
      isInsert = op == "c" || op == "r",
      isUpdate = op == "u",
      isDelete = op == "d",
      before = img("before"), after = img("after"), seq = seq))
  }
}

/** §2.9: apply a CDC micro-batch to a catalog table — the foreachBatch MERGE
  * the reference's threshold-routed SQL generation collapses into
  * (CDCMessageProcessor.scala:32-75: Spark MERGE handles any batch size, so
  * the small-batch/large-batch split disappears).
  */
object CdcApply {

  /** Reduce a batch to final per-key images (arrival order by `seq`), then
    * one MERGE + one delete anti-join against the target table. Returns the
    * new table DataFrame (caller owns the write/swap).
    */
  def applyBatch(target: DataFrame, batch: Dataset[CDCMessage],
      keys: Seq[String]): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val tableCols = target.columns.toSeq

    // last event per key wins (reference processes in arrival order; here
    // the max-seq event is the batch's final word on that key)
    val lastPerKey = batch
      .groupByKey(m => keys.map(k =>
        (if (m.isDelete) m.before else m.after).getOrElse(k, "")))
      .reduceGroups((a, b) => if (a.seq >= b.seq) a else b)
      .map(_._2)

    val upserts = lastPerKey.filter(m => !m.isDelete)
      .map(m => tableCols.map(c => m.after.get(c).orNull))
      .map(vs => Tuple1(vs)).toDF("vals")
      .select(tableCols.zipWithIndex.map { case (c, i) =>
        element_at(col("vals"), i + 1).as(c) }: _*)
    val deletes = lastPerKey.filter(_.isDelete)
      .map(m => keys.map(k => m.before.getOrElse(k, "")))
      .map(vs => Tuple1(vs)).toDF("kvals")
      .select(keys.zipWithIndex.map { case (c, i) =>
        element_at(col("kvals"), i + 1).as(c) }: _*)

    // align string images to the target's types
    val typedUpserts = upserts.select(target.schema.fields.map(f =>
      expr(s"try_cast(`${f.name}` AS ${f.dataType.sql})").as(f.name)).toIndexedSeq: _*)
    val typedDeletes = deletes.select(keys.map { k =>
      val dt = target.schema(k).dataType
      expr(s"try_cast(`$k` AS ${dt.sql})").as(k)
    }: _*)

    val merged = graft.operators.MergeUpsert(target, typedUpserts, keys)
    merged.join(broadcast(typedDeletes), keys, "left_anti")
  }
}
