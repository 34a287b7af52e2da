package graft.model

/** Credential indirection for spec JSON — the local-parity equivalent of
  * the reference's Secrets Manager resolution (common/.../SecretsManagerUtil
  * .scala): connection fields may reference a secret instead of embedding
  * it, so credentials never sit in the stored spec document.
  *
  * Syntax, embeddable anywhere in the field value:
  *   - `${env:VAR}`   → value of environment variable VAR
  *   - `${file:path}` → trimmed contents of `path` (e.g. a mounted secret)
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

  /** Resolve every `${env:...}`/`${file:...}` reference in `value`.
    * Plain values pass through untouched.
    */
  def resolve(value: String, env: String => Option[String] = sys.env.get): String =
    Ref.replaceAllIn(value, m => {
      val resolved = m.group(1) match {
        case "env" =>
          env(m.group(2)).getOrElse(throw new PipelineSpecException(
            s"credential reference '$${env:${m.group(2)}}' names an unset environment variable"))
        case "file" =>
          try new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(m.group(2))),
            java.nio.charset.StandardCharsets.UTF_8).trim
          catch { case e: java.io.IOException =>
            throw new PipelineSpecException(
              s"credential reference '$${file:${m.group(2)}}' is unreadable: ${e.getMessage}")
          }
      }
      scala.util.matching.Regex.quoteReplacement(resolved)
    })

  def resolveOpt(value: Option[String],
      env: String => Option[String] = sys.env.get): Option[String] =
    value.map(resolve(_, env))
}
