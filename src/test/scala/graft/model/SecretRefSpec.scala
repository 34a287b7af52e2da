package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SecretRefSpec extends AnyFunSuite with Matchers {

  test("plain values pass through untouched") {
    SecretRef.resolve("hunter2") shouldBe "hunter2"
    SecretRef.resolve("jdbc:derby:/x;create=true") shouldBe "jdbc:derby:/x;create=true"
  }

  test("${env:VAR} resolves; unset fails fast with a spec error") {
    SecretRef.resolve("${env:GRAFT_PW}",
      env = Map("GRAFT_PW" -> "s3cret").get) shouldBe "s3cret"
    the[PipelineSpecException] thrownBy
      SecretRef.resolve("${env:GRAFT_DEFINITELY_UNSET}", env = _ => None) should
      have message "credential reference '${env:GRAFT_DEFINITELY_UNSET}' names an unset environment variable"
  }

  test("${file:path} resolves trimmed contents; unreadable fails fast") {
    val f = java.nio.file.Files.createTempFile("secret", ".txt")
    java.nio.file.Files.writeString(f, "  p@ss\n")
    SecretRef.resolve(s"$${file:$f}") shouldBe "p@ss"
    an[PipelineSpecException] should be thrownBy
      SecretRef.resolve("${file:/no/such/secret}")
  }

  test("references embed inside a larger value (e.g. a JDBC url)") {
    SecretRef.resolve("jdbc:postgresql://h/db?password=${env:PW}&ssl=true",
      env = Map("PW" -> "a$b").get) shouldBe
      "jdbc:postgresql://h/db?password=a$b&ssl=true" // $ in secret survives
  }

  test("spec load fail-fasts dangling refs but never stores resolved secrets") {
    val f = java.nio.file.Files.createTempFile("secret", ".txt")
    java.nio.file.Files.writeString(f, "filepw")
    val json =
      s"""{"name": "t", "source": {"schema": [{"name": "id", "type": "int"}],
         |  "database": {"url": "jdbc:derby:memory:x", "user": "u",
         |    "password": "$${file:$f}", "table": "t", "timestampFieldName": "ts"}},
         |"destination": {"database": {"url": "jdbc:derby:memory:y",
         |    "password": "$${file:$f}", "table": "t2"}}}""".stripMargin
    val spec = SpecJson.parse(json)
    // the stored document KEEPS the reference — a registered spec is served
    // back over GET /dataset, so plaintext must never enter it; resolution
    // happens again at connection time (JdbcPull/JdbcSink)
    spec.source.database.get.password shouldBe Some(s"$${file:$f}")
    spec.destination.database.get.password shouldBe Some(s"$${file:$f}")
    (SpecJson.write(spec) should not).include("filepw")
    // a dangling reference still fails at LOAD time, before any data moves
    an[PipelineSpecException] should be thrownBy
      SpecJson.parse(json.replace(s"$${file:$f}", "${env:GRAFT_DEFINITELY_UNSET}"))
  }
}
