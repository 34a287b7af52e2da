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

    // unknown dataset files fail but are ledgered (no poison loop)
    Files.writeString(landing.resolve("mystery.tokX.1.dataset.csv"), "a,b\n1,2\n")
    val r3 = w2.poll()
    r3.size shouldBe 1
    r3.head.result.isLeft shouldBe true
    w2.poll() shouldBe empty
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
}
