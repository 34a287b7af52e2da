package graft.sinks

import java.nio.file.{Files, Path}

/** Simulated object store WITHOUT atomic rename — the environment the
  * [[CommitPublisher]] seam exists for (real S3 "rename" is copy+delete).
  *
  *   - `publish` is a full-object PUT: per-key serialized by the store
  *     (the key lock), last writer wins. With `tornWindowMs > 0` the PUT
  *     additionally exposes a partial body to concurrent readers before the
  *     full one lands — the half-state of a copy-phase on a store whose
  *     writes are NOT atomic — so tests can prove the protocol layer
  *     degrades to the previous committed state, never to a wrong file set.
  *   - `publishIfAbsent` is a conditional PUT (`If-None-Match: *`) decided
  *     by the store's own metadata under the key lock — deliberately NOT
  *     the filesystem's atomic `CREATE_NEW`, which object stores lack.
  *
  * Test scope only; a real deployment implements the seam with the store's
  * native conditional-PUT primitives (CommitPublisher.scala:14-21).
  */
final class FakeObjectStorePublisher(tornWindowMs: Long = 0L)
    extends CommitPublisher {

  val puts = new java.util.concurrent.atomic.AtomicInteger
  val conditionalPuts = new java.util.concurrent.atomic.AtomicInteger

  private val keyLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def keyLock(target: Path): Object =
    keyLocks.computeIfAbsent(target.toString, _ => new Object)

  def publish(dir: Path, name: String, content: String): Unit = {
    val target = dir.resolve(name)
    keyLock(target).synchronized {
      puts.incrementAndGet()
      if (tornWindowMs > 0 && content.length > 1) {
        // the injectable torn-read window: readers can observe this
        Files.writeString(target, content.substring(0, content.length / 2))
        Thread.sleep(tornWindowMs)
      }
      Files.writeString(target, content): Unit
    }
  }

  def publishIfAbsent(dir: Path, name: String, content: String): Boolean = {
    val target = dir.resolve(name)
    keyLock(target).synchronized {
      conditionalPuts.incrementAndGet()
      if (Files.exists(target)) false
      else {
        Files.writeString(target, content)
        true
      }
    }
  }
}
