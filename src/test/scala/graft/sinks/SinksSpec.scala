package graft.sinks

import graft.SparkSpec
import graft.model.{JdbcSinkSpec, ObjectStoreSpec}
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {

  private val ss = spark
  import ss.implicits._

  test("object store: partitioned write + catalog + append + deleteBeforeWrite") {
    val root = scratchDir("lake").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_t1", table = "sales",
      partitionBy = Seq("region"))
    val df = Seq((1, "us", 10.0), (2, "eu", 20.0)).toDF("id", "region", "amount")
    ObjectStoreSink.write(spark, df, spec) shouldBe "graft_t1.sales"
    spark.table("graft_t1.sales").count() shouldBe 2
    // partition pruning: only the us directory is read
    val pruned = spark.table("graft_t1.sales").filter($"region" === "us")
    pruned.count() shouldBe 1
    // append
    ObjectStoreSink.write(spark, Seq((3, "us", 30.0)).toDF("id", "region", "amount"), spec)
    spark.table("graft_t1.sales").count() shouldBe 3
    // deleteBeforeWrite truncates
    ObjectStoreSink.write(spark,
      Seq((9, "ap", 90.0)).toDF("id", "region", "amount"),
      spec.copy(deleteBeforeWrite = true))
    spark.table("graft_t1.sales").select("id").as[Int].collect().toSeq shouldBe Seq(9)
  }

  test("object store MERGE on keyFields: staged swap upserts and inserts") {
    val root = scratchDir("lakemerge").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_t2", table = "accounts",
      keyFields = Seq("id"))
    ObjectStoreSink.write(spark,
      Seq((1, "a", 100.0), (2, "b", 200.0)).toDF("id", "name", "bal"), spec)
    // batch: update id=2, insert id=3
    ObjectStoreSink.write(spark,
      Seq((2, "b2", 250.0), (3, "c", 300.0)).toDF("id", "name", "bal"), spec)
    val rows = spark.table("graft_t2.accounts")
      .orderBy("id").as[(Int, String, Double)].collect().toSeq
    rows shouldBe Seq((1, "a", 100.0), (2, "b2", 250.0), (3, "c", 300.0))
  }

  test("object store MERGE with partitions keeps partition layout") {
    val root = scratchDir("lakemergep").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_t3", table = "events",
      partitionBy = Seq("day"), keyFields = Seq("id"))
    ObjectStoreSink.write(spark,
      Seq((1, "2024-01-01", "x"), (2, "2024-01-02", "y")).toDF("id", "day", "v"), spec)
    ObjectStoreSink.write(spark,
      Seq((2, "2024-01-02", "y2"), (3, "2024-01-03", "z")).toDF("id", "day", "v"), spec)
    // partition columns ride last in the physical/catalog schema (standard
    // Spark layout, same as the reference's reorder) — select explicitly
    val rows = spark.table("graft_t3.events").select("id", "day", "v").orderBy("id")
      .as[(Int, String, String)].collect().toSeq
    rows shouldBe Seq((1, "2024-01-01", "x"), (2, "2024-01-02", "y2"), (3, "2024-01-03", "z"))
    // physical layout: day= partition dirs exist under the current version
    val loc = java.nio.file.Paths.get(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("graft_t3.events")).location)
    val dirs = loc.toFile.listFiles().filter(_.isDirectory).map(_.getName).toSet
    dirs.count(_.startsWith("day=")) shouldBe 3
  }

  private val derbyUrl = {
    val dir = scratchDir("derby").getAbsolutePath
    s"jdbc:derby:$dir/db;create=true"
  }
  private def jdbcSpec(table: String, keys: Seq[String] = Nil,
      truncate: Boolean = false) = JdbcSinkSpec(
    url = derbyUrl, driver = Some("org.apache.derby.iapi.jdbc.AutoloadedDriver"),
    table = table, keyFields = keys, truncateBeforeWrite = truncate)

  test("jdbc sink: copy creates table, truncate replaces, merge upserts") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name")
    JdbcSink.write(df, jdbcSpec("people"))
    spark.read.format("jdbc").option("url", derbyUrl)
      .option("dbtable", "people").load().count() shouldBe 2
    // append without truncate
    JdbcSink.write(Seq((3, "c")).toDF("id", "name"), jdbcSpec("people"))
    spark.read.format("jdbc").option("url", derbyUrl)
      .option("dbtable", "people").load().count() shouldBe 3
    // truncateBeforeWrite
    JdbcSink.write(Seq((9, "z")).toDF("id", "name"), jdbcSpec("people", truncate = true))
    val afterTrunc = spark.read.format("jdbc").option("url", derbyUrl)
      .option("dbtable", "people").load()
    afterTrunc.count() shouldBe 1
    // merge: update 9, insert 10 — delete+insert transaction
    JdbcSink.write(Seq((9, "z2"), (10, "w")).toDF("id", "name"),
      jdbcSpec("people", keys = Seq("id")))
    val merged = spark.read.format("jdbc").option("url", derbyUrl)
      .option("dbtable", "people").load()
      .orderBy("id").as[(Int, String)].collect().toSeq
    merged shouldBe Seq((9, "z2"), (10, "w"))
  }

  test("jdbc sink resolves ${file:}/${env:} credential indirection at connect time") {
    // the URL itself is indirected: if SecretRef did not resolve, neither
    // the Spark JDBC write nor the DriverManager DDL path could connect
    val root = java.nio.file.Files.createTempDirectory("secrets-root")
    java.nio.file.Files.writeString(root.resolve("dburl"), derbyUrl + "\n")
    val prev = sys.props.get("graft.secrets.root")
    sys.props("graft.secrets.root") = root.toString
    try {
      JdbcSink.write(Seq((1, "s")).toDF("id", "name"),
        jdbcSpec("secret_t").copy(url = "${file:dburl}"))
      spark.read.format("jdbc").option("url", derbyUrl)
        .option("dbtable", "secret_t").load().count() shouldBe 1
    } finally prev match {
      case Some(v) => sys.props("graft.secrets.root") = v
      case None => sys.props -= "graft.secrets.root"
    }
  }

  test("jdbc sink dialect hooks: typed DDL, preSql/postSql with @table") {
    val df = Seq((1, """{"a":1}""", "x")).toDF("id", "payload", "note")
    val c = java.sql.DriverManager.getConnection(derbyUrl)
    c.createStatement().executeUpdate("CREATE TABLE load_audit (evt VARCHAR(100))")
    JdbcSink.write(df, jdbcSpec("typed_t").copy(
      // the _json → warehouse-native-type seam; CLOB stands in for
      // VARIANT/SUPER on Derby
      columnTypes = Map("payload" -> "CLOB", "note" -> "VARCHAR(2000)"),
      preSql = Seq("INSERT INTO load_audit VALUES ('pre @table')"),
      postSql = Seq("INSERT INTO load_audit VALUES ('post @table')")))
    // created with the verbatim types
    val rs = c.getMetaData.getColumns(null, null, "TYPED_T", null)
    val types = Iterator.continually(rs).takeWhile(_.next())
      .map(r => r.getString("COLUMN_NAME").toLowerCase -> r.getString("TYPE_NAME"))
      .toMap
    types("payload") shouldBe "CLOB"
    types("note") shouldBe "VARCHAR"
    types("id") shouldBe "INTEGER"
    // data landed through the typed table; pre/post ran in order around it
    spark.read.format("jdbc").option("url", derbyUrl)
      .option("dbtable", "typed_t").load().count() shouldBe 1
    val audit = spark.read.format("jdbc").option("url", derbyUrl)
      .option("dbtable", "load_audit").load()
      .as[String].collect().toSeq
    audit shouldBe Seq("pre typed_t", "post typed_t")
    c.close()
  }

  test("schema evolution: changed schema re-creates the table version") {
    val root = scratchDir("lakeevo").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_t4", table = "evo")
    ObjectStoreSink.write(spark, Seq((1, "us")).toDF("id", "region"), spec)
    spark.table("graft_t4.evo").columns.toSeq shouldBe Seq("id", "region")
    // the destination schema gains a column → new table version, old rows
    // surface the new column as NULL
    ObjectStoreSink.write(spark,
      Seq((2, "eu", 9.5)).toDF("id", "region", "score"), spec)
    val t = spark.table("graft_t4.evo")
    t.columns.toSeq shouldBe Seq("id", "region", "score")
    val rows = t.orderBy("id").collect()
    rows.length shouldBe 2
    assert(rows(0).isNullAt(2)) // pre-evolution row
    rows(1).getDouble(2) shouldBe 9.5
  }

  test("concurrent merge writers: all batches land exactly once") {
    val root = scratchDir("lakeconcw").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_tcw", table = "cw",
      keyFields = Seq("id"))
    ObjectStoreSink.write(spark, Seq((-1, "seed")).toDF("id", "v"), spec)
    // 4 writers merge disjoint key batches concurrently; without commit
    // serialization they read the same base version and lose updates
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        val batch = (0 until 25).map(i => (t * 100 + i, s"w$t")).toDF("id", "v")
        ObjectStoreSink.write(spark, batch, spec): Unit
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    val rows = spark.table("graft_tcw.cw")
    rows.count() shouldBe 101 // seed + 4×25, nothing lost, nothing doubled
    rows.select("id").distinct().count() shouldBe 101
  }

  test("versioned swap: concurrent readers never observe a missing table") {
    val root = scratchDir("lakeconc").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_t5", table = "live")
    ObjectStoreSink.write(spark, Seq((1, 10.0)).toDF("id", "v"), spec)

    @volatile var stop = false
    @volatile var failure: Option[Throwable] = None
    val reader = new Thread(() => {
      while (!stop && failure.isEmpty) {
        try {
          val n = spark.table("graft_t5.live").count()
          assert(n >= 1, s"reader saw $n rows")
        } catch { case t: Throwable => failure = Some(t) }
      }
    })
    reader.start()
    try {
      (2 to 8).foreach { i =>
        ObjectStoreSink.replaceTable(spark,
          (1 to i).map(j => (j, j * 10.0)).toDF("id", "v"), spec)
      }
    } finally { stop = true; reader.join(30000) }
    failure.foreach(t => fail(s"concurrent reader failed mid-swap: $t"))
    spark.table("graft_t5.live").count() shouldBe 8
    // during the burst the retire GRACE retains superseded versions (that
    // is what shields in-flight readers); with the grace elapsed (forced to
    // zero) the next swap retires down to the keep count
    def vdirs = new java.io.File(s"$root/graft_t5/live").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v-"))
    vdirs.length should be >= 2
    val saved = ObjectStoreSink.retireGraceMs
    try {
      ObjectStoreSink.retireGraceMs = 0L
      ObjectStoreSink.replaceTable(spark,
        (1 to 9).map(j => (j, j * 10.0)).toDF("id", "v"), spec)
    } finally ObjectStoreSink.retireGraceMs = saved
    vdirs.length should be <= 2
    spark.table("graft_t5.live").count() shouldBe 9
  }

  test("recoverTable: catalog entry lost mid-swap is rebuilt from versioned data") {
    val root = scratchDir("lakerecover").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_t6", table = "crashy",
      partitionBy = Seq("region"))
    ObjectStoreSink.write(spark,
      Seq((1, "us", 1.0), (2, "eu", 2.0)).toDF("id", "region", "v"), spec)
    // simulate a crash between DROP and CREATE: the entry vanishes but the
    // versioned data survives
    spark.sql("DROP TABLE graft_t6.crashy")
    spark.catalog.tableExists("graft_t6.crashy") shouldBe false
    ObjectStoreSink.recoverTable(spark, spec) shouldBe true
    spark.table("graft_t6.crashy").count() shouldBe 2
    // idempotent when healthy; false when there is nothing to recover
    ObjectStoreSink.recoverTable(spark, spec) shouldBe true
    ObjectStoreSink.recoverTable(spark,
      spec.copy(table = "never_existed")) shouldBe false
  }

  test("partition keys are immutable; data columns still evolve") {
    val root = scratchDir("lakeguard").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_t7", table = "g",
      partitionBy = Seq("region"))
    ObjectStoreSink.write(spark,
      Seq((1, "us", 1.0)).toDF("id", "region", "v"), spec)
    // changing the partition layout of an existing table is an error, on
    // every write path
    an[graft.model.PipelineSpecException] should be thrownBy
      ObjectStoreSink.write(spark, Seq((2, "eu", 2.0)).toDF("id", "region", "v"),
        spec.copy(partitionBy = Seq("id")))
    an[graft.model.PipelineSpecException] should be thrownBy
      ObjectStoreSink.replaceTable(spark, Seq((2, "eu", 2.0)).toDF("id", "region", "v"),
        spec.copy(partitionBy = Nil))
    // adding a data column is fine (new table version)
    ObjectStoreSink.write(spark,
      Seq((2, "eu", 2.0, "x")).toDF("id", "region", "v", "tag"), spec)
    spark.table("graft_t7.g").columns should contain ("tag")
    spark.table("graft_t7.g").count() shouldBe 2
  }

  test("replaceTable expectVersion CAS: stale expectation aborts with " +
    "ConcurrentCommitException, current one commits") {
    val root = scratchDir("cas").getAbsolutePath
    val spec = ObjectStoreSpec(path = root, database = "graft_cas", table = "t")
    ObjectStoreSink.write(spark, Seq((1, "a")).toDF("id", "s"), spec)
    ObjectStoreSink.replaceTable(spark, Seq((2, "b")).toDF("id", "s"), spec)
    val latest = ObjectStoreSink.snapshots(spec).last.version
    // a maintenance rewrite that pinned version 1 loses the race: the
    // stale content must NEVER land on top of version `latest`
    val ex = the[ConcurrentCommitException] thrownBy
      ObjectStoreSink.replaceTable(spark, Seq((1, "a")).toDF("id", "s"), spec,
        expectVersion = Some(latest - 1))
    ex.getMessage should include("concurrent writer")
    spark.table("graft_cas.t").as[(Int, String)].collect().toSeq shouldBe
      Seq((2, "b")) // the aborted rewrite left no trace
    ObjectStoreSink.snapshots(spec).last.version shouldBe latest
    // the CURRENT version CAS-es through
    ObjectStoreSink.replaceTable(spark, Seq((3, "c")).toDF("id", "s"), spec,
      expectVersion = Some(latest))
    spark.table("graft_cas.t").as[(Int, String)].collect().toSeq shouldBe
      Seq((3, "c"))
  }

  test("text sink: csv + payload text") {
    val dir = scratchDir("text").getAbsolutePath
    TextSink.writeCsv(Seq((1, "a"), (2, "b")).toDF("id", "name"),
      s"$dir/csv", header = true, delimiter = "|", singleFile = true)
    val lines = spark.read.text(s"$dir/csv").as[String].collect().toSet
    lines should contain ("id|name")
    lines should contain ("1|a")
    TextSink.writeText(Seq("{\"a\":1}").toDF("_json"), "_json", s"$dir/txt")
    spark.read.text(s"$dir/txt").count() shouldBe 1
  }

  test("after a versioned swap EVERY partition entry points into the live " +
    "version dir, so vacuuming the superseded version cannot break reads") {
    val spec = ObjectStoreSpec(path = scratchDir("ppin").getAbsolutePath,
      database = "graft_ppin", table = "t", partitionBy = Seq("p"))
    val mk = (k: Long) => (0L until 40L).map(i => (i + k, (i % 4).toString))
      .toDF("id", "p")
    val fq = ObjectStoreSink.replaceTable(spark, mk(0), spec)
    ObjectStoreSink.replaceTable(spark, mk(100), spec) // the swap under test
    val live = java.nio.file.Paths
      .get(ObjectStoreSink.snapshots(spec).last.path).normalize
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(
      spec.table, Some(spec.database))
    val locs = spark.sessionState.catalog.listPartitions(ident)
      .flatMap(_.storage.locationUri)
    locs should have size 4
    locs.foreach { u =>
      java.nio.file.Paths.get(u.getPath).normalize
        .startsWith(live) shouldBe true
    }
    // the stale-location failure mode this pins: retire the superseded
    // version entirely — reads must survive it
    val grace0 = ObjectStoreSink.retireGraceMs
    ObjectStoreSink.retireGraceMs = 0L
    try graft.operators.Vacuum.vacuumTable(
      java.nio.file.Paths.get(spec.path, spec.database, spec.table), keep = 1)
    finally ObjectStoreSink.retireGraceMs = grace0
    spark.catalog.refreshTable(fq)
    spark.table(fq).count() shouldBe 40L
    spark.table(fq).agg(min("id")).head.getLong(0) shouldBe 100L
  }

  test("recoverTable honors the pinned schema sidecar: a schema-EVOLVED " +
    "table recovers with its widened shape, not the data files' narrower " +
    "one") {
    val ss2 = spark
    import ss2.implicits._
    val spec = graft.model.ObjectStoreSpec(
      path = scratchDir("recoverevolved").toString,
      database = "graft_test", table = s"rcv_${System.nanoTime()}")
    val fq = ObjectStoreSink.replaceTable(spark,
      (0L until 50L).map(i => (i, s"v$i")).toDF("id", "v"), spec)
    ObjectStoreSink.evolveSchema(spark, spec,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("extra",
          org.apache.spark.sql.types.LongType))))
    spark.sql(s"DROP TABLE $fq") // catalog entry lost
    ObjectStoreSink.recoverTable(spark, spec) shouldBe true
    spark.table(fq).columns.toSeq shouldBe Seq("id", "v", "extra")
    spark.table(fq).where("extra IS NOT NULL").count() shouldBe 0L
    spark.table(fq).count() shouldBe 50L
  }
}
