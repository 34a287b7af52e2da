package graft.cdc

import graft.runtime.EventBus

/** K10: CDC fan-out (reference CDCMessagePublisher.scala:33-80) — change
  * messages published to the notification bus in size-bounded JSON chunks
  * with db/schema/table filter attributes, so downstream subscribers (the
  * reference's SNS consumers) can attribute-filter per table. The ≤255 KB
  * chunk bound mirrors the SNS payload limit; an in-process bus doesn't
  * need it, an external broker does — keeping it makes the publisher
  * broker-portable.
  */
final class CdcPublisher(bus: EventBus, maxChunkBytes: Int = 255 * 1024) {

  def publish(messages: Seq[CDCMessage]): Int = {
    if (messages.isEmpty) return 0
    val head = messages.head
    var chunks = 0
    val buf = new StringBuilder("[")
    def flush(): Unit = if (buf.length > 1) {
      buf.append("]")
      chunks += 1
      bus.publish(bus.Notification(
        dataset = s"${head.database}.${head.schema}.${head.table}",
        pipelineToken = "", destination = "cdc",
        database = head.database, table = head.table,
        location = "", attributes = Map(
          "db" -> head.database, "schema" -> head.schema,
          "table" -> head.table, "payload" -> buf.toString)))
      buf.clear(); buf.append("[")
    }
    messages.foreach { m =>
      val json = toJson(m)
      if (buf.length + json.length + 1 > maxChunkBytes) flush()
      if (buf.length > 1) buf.append(",")
      buf.append(json)
    }
    flush()
    chunks
  }

  private def toJson(m: CDCMessage): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def img(mm: Map[String, String]) =
      mm.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    s"""{"database": ${q(m.database)}, "schema": ${q(m.schema)}, "table": ${q(m.table)},
       |"isInsert": ${m.isInsert}, "isUpdate": ${m.isUpdate}, "isDelete": ${m.isDelete},
       |"before": ${img(m.before)}, "after": ${img(m.after)}, "seq": ${m.seq}}"""
      .stripMargin.replace("\n", " ")
  }
}
