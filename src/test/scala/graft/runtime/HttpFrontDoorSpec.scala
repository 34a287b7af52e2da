package graft.runtime

import graft.SparkSpec
import graft.model._
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

class HttpFrontDoorSpec extends SparkSpec {

  private val stockSchema = Seq("symbol" -> "string", "date" -> "string",
    "open" -> "double", "high" -> "double", "low" -> "double",
    "close" -> "double", "volume" -> "int", "adj_close" -> "double")
    .map { case (n, t) => FieldSpec(n, t) }

  private val client = HttpClient.newHttpClient()

  private def get(url: String, headers: (String, String)*): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(url))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.GET().build(), HttpResponse.BodyHandlers.ofString())
  }

  private def post(url: String, body: Array[Byte],
      headers: (String, String)*): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(url))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
      HttpResponse.BodyHandlers.ofString())
  }

  test("upload -> poll -> table landed; registration, status, pagination, 404s") {
    val landing = scratchDir("httpland").toPath
    val lake = scratchDir("httplake").getAbsolutePath
    val fd = HttpFrontDoor.serve(spark, landing, landing.resolve(".ledger"))
    try {
      val base = s"http://localhost:${fd.boundPort}"
      get(s"$base/health").statusCode() shouldBe 200

      // register a dataset over the wire with the engine's own JSON codec
      val spec = PipelineSpec(
        name = "stock_http",
        source = SourceSpec(schema = stockSchema,
          file = Some(FileSpec(csv = Some(CsvSpec())))),
        destination = DestinationSpec(objectStore = Some(
          ObjectStoreSpec(path = lake, database = "graft_http", table = "stock_http"))))
      post(s"$base/dataset", SpecJson.write(spec).getBytes("UTF-8"))
        .statusCode() shouldBe 200
      get(s"$base/datasets").body() shouldBe "[\"stock_http\"]"
      get(s"$base/dataset?dataset=stock_http").body() should include ("stock_http")
      get(s"$base/dataset?dataset=nope").statusCode() shouldBe 404

      // upload to an unregistered dataset → 404; registered → landed file
      val bytes = Files.readAllBytes(
        Paths.get("/root/repo/fixtures/stock_price.20170102.small.dataset.csv"))
      post(s"$base/dataset/upload?dataset=nope", bytes).statusCode() shouldBe 404
      val up = post(
        s"$base/dataset/upload?dataset=stock_http&publishertoken=tok9&filename=x.csv",
        bytes)
      up.statusCode() shouldBe 200
      up.body() should include ("stock_http.tok9.")
      Files.list(landing).filter(_.getFileName.toString.startsWith("stock_http."))
        .count() shouldBe 1

      // poll processes the arrival through the real pipeline
      val poll = post(s"$base/poll", Array.emptyByteArray)
      poll.statusCode() shouldBe 200
      poll.body() should include (""""ok": true""")
      spark.table("graft_http.stock_http").count() shouldBe 4
      // a second poll sees nothing new (ledger)
      post(s"$base/poll", Array.emptyByteArray).body() shouldBe "[]"

      // status surface: summary lists the run, token fetch shows steps
      val summary = get(s"$base/status/summary?dataset=stock_http").body()
      summary should include (""""status": "completed"""")
      val token = """"pipelineToken": "([^"]+)"""".r
        .findFirstMatchIn(summary).get.group(1)
      val steps = get(s"$base/status?token=$token").body()
      steps should include (""""step": "begin"""")
      steps should include (""""step": "end"""")
      // an empty page far past the data
      get(s"$base/status/summary?dataset=stock_http&page=99").body() shouldBe "[]"

      // snapshot log over the wire: one committed live version with the
      // manifest's exact row accounting
      val snaps = get(s"$base/snapshots?dataset=stock_http")
      snaps.statusCode() shouldBe 200
      snaps.body() should include (""""rowCount": 4""")
      snaps.body() should include (""""live": true""")
      get(s"$base/snapshots?dataset=nope").statusCode() shouldBe 404
      get(s"$base/snapshots").statusCode() shouldBe 400

      // unregister
      client.send(HttpRequest.newBuilder(
        URI.create(s"$base/dataset?dataset=stock_http")).DELETE().build(),
        HttpResponse.BodyHandlers.ofString()).statusCode() shouldBe 200
      get(s"$base/datasets").body() shouldBe "[]"
    } finally fd.stop()
  }

  test("dataset generate: infers a registrable spec from a CSV sample") {
    val landing = scratchDir("httpgen").toPath
    val fd = HttpFrontDoor.serve(spark, landing, landing.resolve(".ledger"))
    try {
      val base = s"http://localhost:${fd.boundPort}"
      val sample = "sym,qty,price,when\nAAA,3,1.5,2026-01-01 10:00:00\nBBB,4,2.5,2026-01-02 11:00:00\n"
      val resp = post(s"$base/dataset/generate?dataset=gen_ds",
        sample.getBytes("UTF-8"))
      resp.statusCode() shouldBe 200
      // the generated JSON is a real spec: parse it back and check inference
      val spec = SpecJson.parse(resp.body())
      spec.name shouldBe "gen_ds"
      spec.source.schema.map(f => f.name -> f.`type`) shouldBe Seq(
        "sym" -> "string", "qty" -> "int", "price" -> "double",
        "when" -> "timestamp")
      spec.source.file.flatMap(_.csv).map(_.header) shouldBe Some(true)
      // round trip: the generated spec registers as-is
      post(s"$base/dataset", resp.body().getBytes("UTF-8")).statusCode() shouldBe 200
      get(s"$base/datasets").body() should include ("gen_ds")
    } finally fd.stop()
  }

  test("x-api-key gate: 401 without the key, 200 with it") {
    val landing = scratchDir("httpkey").toPath
    val fd = HttpFrontDoor.serve(spark, landing, landing.resolve(".ledger"),
      apiKey = Some("sekrit"))
    try {
      val base = s"http://localhost:${fd.boundPort}"
      get(s"$base/health").statusCode() shouldBe 401
      get(s"$base/health", "x-api-key" -> "wrong").statusCode() shouldBe 401
      get(s"$base/health", "x-api-key" -> "sekrit").statusCode() shouldBe 200
    } finally fd.stop()
  }
}
