package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SecretRefSpec extends AnyFunSuite with Matchers {

  private def freshRoot(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("secrets-root")

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

  test("${file:path} resolves trimmed contents under the root; unreadable fails fast") {
    val root = freshRoot()
    java.nio.file.Files.writeString(root.resolve("db.pass"), "  p@ss\n")
    SecretRef.resolve("${file:db.pass}", secretsRoot = Some(root)) shouldBe "p@ss"
    // an absolute path is accepted only if it stays inside the root
    SecretRef.resolve(s"$${file:${root.resolve("db.pass")}}",
      secretsRoot = Some(root)) shouldBe "p@ss"
    an[PipelineSpecException] should be thrownBy
      SecretRef.resolve("${file:no/such/secret}", secretsRoot = Some(root))
  }

  test("${file:path} is disabled when no secrets root is configured") {
    val e = the[PipelineSpecException] thrownBy
      SecretRef.resolve("${file:/etc/hostname}", secretsRoot = None)
    e.getMessage should include("no secrets root is configured")
  }

  test("${file:path} escapes of the secrets root are rejected (.., absolute, symlink)") {
    val root = freshRoot()
    val outside = java.nio.file.Files.createTempFile("outside", ".txt")
    java.nio.file.Files.writeString(outside, "leak")
    // .. traversal — rejected lexically, whether or not the target exists
    // (the rejection must not act as a file-existence oracle)
    (the[PipelineSpecException] thrownBy SecretRef.resolve(
      s"$${file:../${outside.getFileName}}", secretsRoot = Some(root)))
      .getMessage should include("escapes the secrets root")
    (the[PipelineSpecException] thrownBy SecretRef.resolve(
      "${file:../no/such/file/anywhere}", secretsRoot = Some(root)))
      .getMessage should include("escapes the secrets root")
    // absolute path outside the root
    (the[PipelineSpecException] thrownBy SecretRef.resolve(
      s"$${file:$outside}", secretsRoot = Some(root)))
      .getMessage should include("escapes the secrets root")
    // a symlink INSIDE the root pointing outside it
    val link = root.resolve("sneaky")
    java.nio.file.Files.createSymbolicLink(link, outside)
    (the[PipelineSpecException] thrownBy SecretRef.resolve(
      "${file:sneaky}", secretsRoot = Some(root)))
      .getMessage should include("escapes the secrets root")
  }

  test("references embed inside a larger value (e.g. a JDBC url)") {
    SecretRef.resolve("jdbc:postgresql://h/db?password=${env:PW}&ssl=true",
      env = Map("PW" -> "a$b").get) shouldBe
      "jdbc:postgresql://h/db?password=a$b&ssl=true" // $ in secret survives
  }

  test("spec load fail-fasts dangling refs but never stores resolved secrets") {
    val root = freshRoot()
    java.nio.file.Files.writeString(root.resolve("pw"), "filepw")
    val prev = sys.props.get("graft.secrets.root")
    sys.props("graft.secrets.root") = root.toString
    try {
      val json =
        s"""{"name": "t", "source": {"schema": [{"name": "id", "type": "int"}],
           |  "database": {"url": "jdbc:derby:memory:x", "user": "u",
           |    "password": "$${file:pw}", "table": "t", "timestampFieldName": "ts"}},
           |"destination": {"database": {"url": "jdbc:derby:memory:y",
           |    "password": "$${file:pw}", "table": "t2"}}}""".stripMargin
      val spec = SpecJson.parse(json)
      // the stored document KEEPS the reference — a registered spec is served
      // back over GET /dataset, so plaintext must never enter it; resolution
      // happens again at connection time (JdbcPull/JdbcSink)
      spec.source.database.get.password shouldBe Some("${file:pw}")
      spec.destination.database.get.password shouldBe Some("${file:pw}")
      (SpecJson.write(spec) should not).include("filepw")
      // a dangling reference still fails at LOAD time, before any data moves
      an[PipelineSpecException] should be thrownBy
        SpecJson.parse(json.replace("${file:pw}", "${env:GRAFT_DEFINITELY_UNSET}"))
      // a spec whose ref escapes the root is rejected at registration time —
      // the HTTP front door's POST /dataset cannot be used to read arbitrary
      // process-readable files
      an[PipelineSpecException] should be thrownBy
        SpecJson.parse(json.replace("${file:pw}", "${file:../../etc/passwd}"))
    } finally prev match {
      case Some(v) => sys.props("graft.secrets.root") = v
      case None => sys.props -= "graft.secrets.root"
    }
  }
}
