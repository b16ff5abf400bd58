package graft.engine

import java.nio.charset.StandardCharsets.UTF_8

/** The three primitives the manifest publication protocol needs from a
  * pointer medium, expressed so they exist BOTH on rename-capable
  * filesystems and on plain object stores:
  *
  *   - `get`: read an object and its version TAG (ETag / generation)
  *   - `putIfAbsent`: create iff absent (S3 `If-None-Match: *`, GCS
  *     `ifGenerationMatch: 0`, Azure `If-None-Match: *`)
  *   - `putIfMatch`: replace iff the tag still matches (S3/Azure
  *     `If-Match: <etag>`, GCS `ifGenerationMatch: <gen>`)
  *
  * [[ManifestTable]] documents that plain object stores have NO atomic
  * rename, so its rename-based pointer swap degrades there. A
  * [[PointerStore]] closes that gap: the pointer swap becomes a CAS
  * loop and the publish lock becomes a conditional-PUT takeover — the
  * no-torn-read and single-writer guarantees then rest on the store's
  * conditional-write primitive, which every major object store ships.
  * Only the POINTER and LOCK objects go through the store; data files
  * are immutable write-once objects (a plain object PUT is atomic per
  * object) and never need rename.
  */
trait PointerStore {
  /** Content and version tag of `path`, or None if absent. */
  def get(path: String): Option[(String, String)]

  /** Create `path` with `content` iff it does not exist. True iff this
    * call created it (linearizable create-if-absent). */
  def putIfAbsent(path: String, content: String): Boolean

  /** Replace `path` with `content` iff its current tag equals `tag`.
    * True iff this call replaced it (linearizable compare-and-swap). */
  def putIfMatch(path: String, content: String, tag: String): Boolean

  /** Best-effort unconditional delete (lock release). */
  def delete(path: String): Unit

  /** Delete `path` iff its current tag equals `tag` (S3/Azure
    * `If-Match` delete, GCS `ifGenerationMatch`). True iff this call
    * deleted it — the conditional RELEASE: an owner whose lock was
    * taken over must not delete the new owner's lock. */
  def deleteIfMatch(path: String, tag: String): Boolean
}

/** Local-filesystem EMULATION of a conditional-PUT object store, for
  * tests: the protocol code above it may only call the four
  * [[PointerStore]] operations, and each operation is linearizable
  * (per-path monitor + content-derived tag), so a race that the
  * protocol survives here it survives against a real store's
  * conditional PUTs. The emulation is in-process (monitors do not span
  * JVMs) — exactly the scope of the race tests. Tags are md5 of
  * content, unique in this protocol because pointer contents embed a
  * fresh uuid per version/commit and lock contents embed owner+nonce.
  */
final class EmulatedConditionalPutStore extends PointerStore {
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def mon(p: String): Object =
    monitors.computeIfAbsent(p, _ => new Object)
  private def tagOf(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
  private def nioPath(p: String): java.nio.file.Path =
    java.nio.file.Paths.get(p.stripPrefix("file:"))

  override def get(path: String): Option[(String, String)] =
    mon(path).synchronized {
      val f = nioPath(path)
      if (!java.nio.file.Files.exists(f)) None
      else {
        val b = java.nio.file.Files.readAllBytes(f)
        Some((new String(b, UTF_8), tagOf(b)))
      }
    }

  override def putIfAbsent(path: String, content: String): Boolean =
    mon(path).synchronized {
      val f = nioPath(path)
      if (java.nio.file.Files.exists(f)) false
      else {
        java.nio.file.Files.createDirectories(f.getParent)
        java.nio.file.Files.write(f, content.getBytes(UTF_8))
        true
      }
    }

  override def putIfMatch(path: String, content: String,
      tag: String): Boolean =
    mon(path).synchronized {
      val f = nioPath(path)
      if (!java.nio.file.Files.exists(f)) false
      else if (tagOf(java.nio.file.Files.readAllBytes(f)) != tag) false
      else {
        java.nio.file.Files.write(f, content.getBytes(UTF_8))
        true
      }
    }

  override def delete(path: String): Unit =
    mon(path).synchronized {
      java.nio.file.Files.deleteIfExists(nioPath(path)); ()
    }

  override def deleteIfMatch(path: String, tag: String): Boolean =
    mon(path).synchronized {
      val f = nioPath(path)
      java.nio.file.Files.exists(f) &&
        tagOf(java.nio.file.Files.readAllBytes(f)) == tag && {
          java.nio.file.Files.delete(f); true
        }
    }
}
