package graft.runtime

import graft.SparkSpec
import graft.cdc.WatermarkStore
import graft.model._
import java.time.{ZoneOffset, ZonedDateTime}

class PullRunnerSpec extends SparkSpec {

  test("due pulls land incrementally in the object store; cron gates re-runs") {
    val dir = scratchDir("pullrun").toPath
    val url = s"jdbc:derby:$dir/db;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    c.createStatement().executeUpdate(
      "CREATE TABLE src_po (id INT, name VARCHAR(20), updated TIMESTAMP)")
    def ins(id: Int, name: String, ts: String): Unit =
      c.createStatement().executeUpdate(
        s"INSERT INTO src_po VALUES ($id, '$name', TIMESTAMP('$ts'))")
    ins(1, "a", "2026-01-01 10:00:00")
    ins(2, "b", "2026-01-01 11:00:00")

    val lake = scratchDir("pulllake").getAbsolutePath
    val spec = PipelineSpec(
      name = "po",
      source = SourceSpec(
        schema = Seq(FieldSpec("id", "int"), FieldSpec("name", "string"),
          FieldSpec("updated", "timestamp")),
        database = Some(JdbcSourceSpec(url = url, table = "src_po",
          timestampFieldName = "updated", cronExpression = Some("0 * * * *")))),
      destination = DestinationSpec(objectStore = Some(
        ObjectStoreSpec(path = lake, database = "graft_pr", table = "po"))))

    val runner = new PullRunner(spark, Map("po" -> spec),
      new WatermarkStore(dir.resolve("wm.properties")))
    val t0 = ZonedDateTime.of(2026, 1, 1, 12, 0, 0, 0, ZoneOffset.UTC)

    val r1 = runner.runDue(t0)
    r1.map(o => (o.dataset, o.rows)) shouldBe Seq(("po", 2L))
    spark.table("graft_pr.po").count() shouldBe 2

    // 20 minutes later: cron (hourly) not due yet → nothing happens
    runner.runDue(t0.plusMinutes(20)) shouldBe empty

    // next hour: due, but no new rows → empty pull, no append
    runner.runDue(t0.plusHours(1)).map(_.rows) shouldBe Seq(0L)
    spark.table("graft_pr.po").count() shouldBe 2

    // new source row → next due tick appends exactly it
    ins(3, "c", "2026-01-01 13:30:00")
    val r4 = runner.runDue(t0.plusHours(2))
    r4.map(_.rows) shouldBe Seq(1L)
    spark.table("graft_pr.po").count() shouldBe 3
    c.close()
  }

  test("sink failure leaves watermark unchanged; next tick re-delivers the window") {
    val dir = scratchDir("pullfail").toPath
    val url = s"jdbc:derby:$dir/db;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    c.createStatement().executeUpdate(
      "CREATE TABLE src_pf (id INT, updated TIMESTAMP)")
    c.createStatement().executeUpdate(
      "INSERT INTO src_pf VALUES (1, TIMESTAMP('2026-01-01 10:00:00'))")
    c.createStatement().executeUpdate(
      "INSERT INTO src_pf VALUES (2, TIMESTAMP('2026-01-01 11:00:00'))")

    def specWith(dest: DestinationSpec) = PipelineSpec(
      name = "pf",
      source = SourceSpec(
        schema = Seq(FieldSpec("id", "int"), FieldSpec("updated", "timestamp")),
        database = Some(JdbcSourceSpec(url = url, table = "src_pf",
          timestampFieldName = "updated"))),
      destination = dest)

    val store = new WatermarkStore(dir.resolve("wm.properties"))
    val t0 = ZonedDateTime.of(2026, 1, 1, 12, 0, 0, 0, ZoneOffset.UTC)

    // destination JDBC url is unreachable → the sink write throws AFTER the
    // pull succeeded; the watermark must NOT have been committed
    val broken = new PullRunner(spark, Map("pf" -> specWith(DestinationSpec(
      database = Some(JdbcSinkSpec(url = "jdbc:derby:/nonexistent/nope",
        table = "pf_dest"))))),
      store)
    an[Exception] should be thrownBy broken.runDue(t0)
    store.get("pf") shouldBe None

    // same store, working destination → the SAME window is re-delivered
    val lake = scratchDir("pflake").getAbsolutePath
    val fixed = new PullRunner(spark, Map("pf" -> specWith(DestinationSpec(
      objectStore = Some(ObjectStoreSpec(path = lake, database = "graft_pf",
        table = "pf"))))), store)
    fixed.runDue(t0.plusHours(1)).map(_.rows) shouldBe Seq(2L)
    spark.table("graft_pf.pf").count() shouldBe 2
    store.get("pf").get should startWith ("2026-01-01 11:00:00")
    c.close()
  }
}
