package graft.runtime

import graft.SparkSpec
import graft.model._
import graft.cdc.{CDCMessage, CdcPublisher}
import java.nio.file.{Files, Paths}

class WatcherSpec extends SparkSpec {

  private val stockSchema = Seq("symbol" -> "string", "date" -> "string",
    "open" -> "double", "high" -> "double", "low" -> "double",
    "close" -> "double", "volume" -> "int", "adj_close" -> "double")
    .map { case (n, t) => FieldSpec(n, t) }

  test("watcher: processes unseen files once, ledger survives restarts") {
    val landing = scratchDir("landing").toPath
    val lake = scratchDir("wlake").getAbsolutePath
    val ledger = landing.resolve(".ledger")
    val spec = PipelineSpec(
      name = "stock_price",
      source = SourceSpec(schema = stockSchema,
        file = Some(FileSpec(csv = Some(CsvSpec())))),
      destination = DestinationSpec(objectStore = Some(
        ObjectStoreSpec(path = lake, database = "graft_w", table = "stock_watch"))))
    Files.copy(Paths.get("/root/repo/fixtures/stock_price.20170102.small.dataset.csv"),
      landing.resolve("stock_price.tok1.20170102.dataset.csv"))

    val w = new Watcher(spark, landing, Map("stock_price" -> spec), ledger)
    val r1 = w.poll()
    r1.size shouldBe 1
    r1.head.result.isRight shouldBe true
    spark.table("graft_w.stock_watch").count() shouldBe 4

    // second poll: nothing new
    w.poll() shouldBe empty

    // a new file arrives; a FRESH watcher (restart) sees only it
    Files.copy(Paths.get("/root/repo/fixtures/stock_price.20170102.small.dataset.csv"),
      landing.resolve("stock_price.tok2.20170102.dataset.csv"))
    val w2 = new Watcher(spark, landing, Map("stock_price" -> spec), ledger)
    val r2 = w2.poll()
    r2.size shouldBe 1
    spark.table("graft_w.stock_watch").count() shouldBe 8 // appended

    // a failing file burns one retry per poll (transient errors get another
    // chance), then dead-letters — no poison loop, no silent mark-as-done
    Files.writeString(landing.resolve("mystery.tokX.1.dataset.csv"), "a,b\n1,2\n")
    val r3 = w2.poll()
    r3.size shouldBe 1
    r3.head.result.isLeft shouldBe true
    w2.poll().map(_.result.isLeft) shouldBe Seq(true) // retry 2
    w2.poll().map(_.result.isLeft) shouldBe Seq(true) // retry 3 = budget
    w2.poll() shouldBe empty                           // dead-lettered
    w2.deadLettered shouldBe Seq("mystery.tokX.1.dataset.csv")
    // dead-letter state survives a restart, successes are not in it
    val w3 = new Watcher(spark, landing, Map("stock_price" -> spec), ledger)
    w3.poll() shouldBe empty
    w3.deadLettered shouldBe Seq("mystery.tokX.1.dataset.csv")
  }

  test("unstructured passthrough: copy + guid rename + notification") {
    val landing = scratchDir("ulanding").toPath
    val lake = scratchDir("ulake").getAbsolutePath
    Files.write(landing.resolve("parkinglot.tok.1.dataset.jpeg"),
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 1, 2, 3))
    val spec = PipelineSpec(
      name = "parkinglot",
      source = SourceSpec(schema = Seq(FieldSpec("_raw", "string")),
        file = Some(FileSpec(unstructured = Some(
          UnstructuredSpec(fileExtension = "jpeg"))))),
      destination = DestinationSpec(objectStore = Some(
        ObjectStoreSpec(path = lake, database = "graft_w", table = "images"))))
    val res = Pipeline.run(spark, spec,
      landing.resolve("parkinglot.tok.1.dataset.jpeg").toString)
    res.rowsWritten shouldBe 1
    val landed = new java.io.File(s"$lake/graft_w/images").listFiles()
    landed.length shouldBe 1
    landed.head.getName should endWith (".jpeg")
    landed.head.getName should not be "parkinglot.tok.1.dataset.jpeg" // GUID renamed
    // deterministic rename: same source name → same GUID
    landed.head.getName shouldBe
      s"${graft.functions.GuidV5.nameUUID("parkinglot.tok.1.dataset.jpeg")}.jpeg"
  }

  test("cdc publisher chunks payloads under the size bound") {
    val bus = new graft.runtime.EventBus
    var got = Vector.empty[String]
    bus.subscribe(Map("table" -> "orders")) { n => got :+= n.attributes("payload") }
    val msgs = (1 to 50).map(i => CDCMessage("shop", "dbo", "orders",
      isInsert = true, isUpdate = false, isDelete = false,
      Map.empty, Map("id" -> i.toString, "pad" -> ("x" * 100)), i.toLong))
    val chunks = new CdcPublisher(bus, maxChunkBytes = 2000).publish(msgs)
    chunks should be > 1
    got.size shouldBe chunks
    got.foreach(p => p.length should be <= 2000)
    // every message present exactly once across chunks
    got.mkString.split("\"seq\": ").length - 1 shouldBe 50
    // filter: a non-matching subscriber sees nothing
    var other = 0
    bus.subscribe(Map("table" -> "nope")) { _ => other += 1 }
    new CdcPublisher(bus, 2000).publish(msgs.take(3))
    other shouldBe 0
  }

  test("cdc publisher: multi-table batch groups chunks per table") {
    val bus = new graft.runtime.EventBus
    var orders = Vector.empty[String]
    var users = Vector.empty[String]
    bus.subscribe(Map("table" -> "orders")) { n => orders :+= n.attributes("payload") }
    bus.subscribe(Map("table" -> "users")) { n => users :+= n.attributes("payload") }
    def msg(tbl: String, id: Int) = CDCMessage("shop", "dbo", tbl,
      isInsert = true, isUpdate = false, isDelete = false,
      Map.empty, Map("id" -> id.toString), id.toLong)
    // interleaved tables in one batch
    val batch = Seq(msg("orders", 1), msg("users", 2), msg("orders", 3), msg("users", 4))
    new CdcPublisher(bus).publish(batch) shouldBe 2
    // each subscriber got exactly its own table's events — never the other's
    orders.mkString.split("\"seq\": ").length - 1 shouldBe 2
    orders.foreach(p => p should not include "\"table\": \"users\"")
    users.mkString.split("\"seq\": ").length - 1 shouldBe 2
    users.foreach(p => p should not include "\"table\": \"orders\"")
  }

  test("cdc publisher: oversized single message flushes alone, neighbors intact") {
    val bus = new graft.runtime.EventBus
    var got = Vector.empty[String]
    bus.subscribe(Map("table" -> "t")) { n => got :+= n.attributes("payload") }
    def msg(id: Int, pad: Int) = CDCMessage("d", "s", "t",
      isInsert = true, isUpdate = false, isDelete = false,
      Map.empty, Map("id" -> id.toString, "pad" -> ("x" * pad)), id.toLong)
    val chunks = new CdcPublisher(bus, maxChunkBytes = 500)
      .publish(Seq(msg(1, 10), msg(2, 2000), msg(3, 10)))
    chunks shouldBe 3
    got.size shouldBe 3
    // the oversized message is its own chunk; the small ones stay bounded
    got.count(_.length > 500) shouldBe 1
    got.count(_.length <= 500) shouldBe 2
    got.mkString.split("\"seq\": ").length - 1 shouldBe 3
  }
}
