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
}
