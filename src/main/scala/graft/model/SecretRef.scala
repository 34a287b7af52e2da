package graft.model

import java.nio.file.{Files, Path, Paths}

/** Credential indirection for spec JSON — the local-parity equivalent of
  * the reference's Secrets Manager resolution (common/.../SecretsManagerUtil
  * .scala): connection fields may reference a secret instead of embedding
  * it, so credentials never sit in the stored spec document.
  *
  * Syntax, embeddable anywhere in the field value:
  *   - `${env:VAR}`   → value of environment variable VAR
  *   - `${file:path}` → trimmed contents of `path` under the secrets root
  *
  * `${file:}` is confined to a configured SECRETS ROOT directory
  * (`GRAFT_SECRETS_ROOT` env var or `-Dgraft.secrets.root`), the local
  * analogue of the IAM scoping the reference gets for free from Secrets
  * Manager: specs can be registered over HTTP, and an unconfined file ref
  * would let a registrant exfiltrate any process-readable file as a
  * "credential". Paths are resolved against the root; escapes via `..` are
  * rejected lexically (no filesystem probe, so rejection is not a
  * file-existence oracle) and symlink escapes are rejected after
  * `toRealPath`. With no root configured, file indirection is disabled
  * outright — env refs still work.
  *
  * References are CHECKED at spec-load time ([[PipelineSpec.normalized]] —
  * a dangling reference fails fast with a [[PipelineSpecException]] before
  * any data moves) but the resolved secret is discarded there: the stored
  * spec document keeps the reference, because registered specs are served
  * back over the HTTP registry (`GET /dataset`) and plaintext credentials
  * must never enter them. Actual resolution happens at CONNECTION time in
  * the JDBC source/sink, so programmatically-built specs get the same
  * indirection.
  */
object SecretRef {

  private val Ref = raw"\$$\{(env|file):([^}]+)\}".r

  /** The directory `${file:}` references are confined to, if configured. */
  def configuredRoot: Option[Path] =
    sys.props.get("graft.secrets.root")
      .orElse(sys.env.get("GRAFT_SECRETS_ROOT"))
      .filter(_.nonEmpty).map(Paths.get(_))

  /** Resolve every `${env:...}`/`${file:...}` reference in `value`.
    * Plain values pass through untouched.
    */
  def resolve(value: String, env: String => Option[String] = sys.env.get,
      secretsRoot: Option[Path] = configuredRoot): String =
    Ref.replaceAllIn(value, m => {
      val resolved = m.group(1) match {
        case "env" =>
          env(m.group(2)).getOrElse(throw new PipelineSpecException(
            s"credential reference '$${env:${m.group(2)}}' names an unset environment variable"))
        case "file" => readSecretFile(m.group(2), secretsRoot)
      }
      scala.util.matching.Regex.quoteReplacement(resolved)
    })

  def resolveOpt(value: Option[String],
      env: String => Option[String] = sys.env.get,
      secretsRoot: Option[Path] = configuredRoot): Option[String] =
    value.map(resolve(_, env, secretsRoot))

  private def readSecretFile(ref: String, secretsRoot: Option[Path]): String = {
    val root = secretsRoot.getOrElse(throw new PipelineSpecException(
      s"credential reference '$${file:$ref}' rejected: no secrets root is " +
        "configured (set GRAFT_SECRETS_ROOT or -Dgraft.secrets.root); " +
        "${file:} indirection is disabled without one"))
    def escape = new PipelineSpecException(
      s"credential reference '$${file:$ref}' escapes the secrets root '$root'")
    try {
      val rootReal = root.toRealPath()
      // lexical containment first: an escaping path is rejected WITHOUT
      // touching the filesystem, so the error is not an existence oracle
      val joined = rootReal.resolve(ref).normalize()
      if (!joined.startsWith(rootReal)) throw escape
      val real = joined.toRealPath() // then symlink-resolved containment
      if (!real.startsWith(rootReal)) throw escape
      new String(Files.readAllBytes(real),
        java.nio.charset.StandardCharsets.UTF_8).trim
    } catch {
      case e: PipelineSpecException => throw e
      case e: java.io.IOException =>
        throw new PipelineSpecException(
          s"credential reference '$${file:$ref}' is unreadable: ${e.getMessage}")
    }
  }
}
