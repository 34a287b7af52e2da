package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.UUID

/** Name-based (version 5, SHA-1) UUID per RFC 4122 §4.3 — deterministic ids
  * for pipeline tokens and staging names (reference GuidV5.scala:25-49 use).
  */
object GuidV5 {

  /** RFC 4122 namespace for URL names (any fixed namespace works for
    * pipeline tokens; URL is the conventional default).
    */
  val UrlNamespace: UUID = UUID.fromString("6ba7b811-9dad-11d1-80b4-00c04fd430c8")

  def nameUUID(name: String, namespace: UUID = UrlNamespace): UUID = {
    val md = MessageDigest.getInstance("SHA-1")
    val nsBytes = java.nio.ByteBuffer.allocate(16)
      .putLong(namespace.getMostSignificantBits)
      .putLong(namespace.getLeastSignificantBits).array()
    md.update(nsBytes)
    md.update(name.getBytes(StandardCharsets.UTF_8))
    val h = md.digest()
    h(6) = ((h(6) & 0x0f) | 0x50).toByte // version 5
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    val bb = java.nio.ByteBuffer.wrap(h, 0, 16)
    new UUID(bb.getLong, bb.getLong)
  }
}
