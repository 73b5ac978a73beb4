package graft.catalog

import java.nio.file.Path
import java.util.concurrent.ThreadLocalRandom

import scala.collection.concurrent.TrieMap

/** The object-store side of the [[CommitMutex]] seam, exactly as
  * COMMITS.md §"Object-store mapping" documents it: no lock at all —
  * an OPTIMISTIC loop whose commit point is a conditional put of the
  * pointer log. `withLock` runs `body`; when the body's conditional put
  * loses the race it throws [[CommitConflictException]], and the mutex
  * re-runs the body after bounded jittered backoff. This is sound
  * because of the contract documented on [[CommitMutex]]: every commit
  * path re-reads table state at the TOP of the body, so a retry
  * recomputes against the winner's log (Iceberg's commit loop). A lost
  * attempt's data/shard writes are orphan debris under a now-unused
  * snapshot prefix — `removeOrphanFiles` territory, never corruption.
  *
  * Conditional-put primitives per store (all public APIs):
  * S3 `PutObject` + `If-Match`/`If-None-Match: *`, GCS
  * `ifGenerationMatch`, Azure Blob `If-Match` — modeled here by
  * [[InMemoryObjectStore.putIf]].
  */
final class CasCommitMutex(maxRetries: Int = 50, baseBackoffMs: Long = 1)
    extends CommitMutex {
  override def withLock[T](key: String, lockPath: Path)(body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case _: CommitConflictException if attempt < maxRetries =>
          attempt += 1
          // jittered linear backoff: contention cost proportional to
          // actual conflicts (COMMITS.md "why not a lock service")
          Thread.sleep(ThreadLocalRandom.current().nextLong(
            baseBackoffMs, baseBackoffMs * (attempt + 1) + 1))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Thrown by a conditional put that lost the commit race; the marker
  * [[CasCommitMutex]] catches to re-run the body. */
final class CommitConflictException(key: String, msg: String)
    extends RuntimeException(s"commit conflict on $key: $msg")

/** In-memory model of an S3-class object store: unversioned plain PUTs
  * for write-once data/shard objects, conditional puts (compare-and-swap
  * on a monotonically increasing etag) for the pointer log. The
  * concurrency semantics mirror what S3/GCS/Azure guarantee: `putIf` is
  * atomic with respect to concurrent `putIf`/`get` on the same key.
  *
  * Crash injection: `failAfterShardWrite` simulates a writer dying
  * between the shard write and the log publish (COMMITS.md crash
  * analysis step 3-4: nothing visible, orphan debris only). */
final class InMemoryObjectStore {
  final case class Obj(bytes: Array[Byte], etag: Long)
  private val objects = TrieMap.empty[String, Obj]
  private val putIfLock = new Object
  @volatile var conflicts: Long = 0L

  def get(key: String): Option[Obj] = objects.get(key)

  /** Plain PUT — write-once data files and metadata shards. */
  def put(key: String, bytes: Array[Byte]): Unit =
    objects.updateWith(key) {
      case Some(o) => Some(Obj(bytes, o.etag + 1))
      case None    => Some(Obj(bytes, 1L))
    }

  /** Conditional put: `ifEtag = None` means If-None-Match:* (create —
    * fails if the object exists); `Some(e)` means If-Match: e (replace —
    * fails unless the current etag is exactly e). Throws
    * [[CommitConflictException]] on precondition failure, exactly the
    * marker the CAS loop retries on. */
  def putIf(key: String, bytes: Array[Byte], ifEtag: Option[Long]): Long =
    putIfLock.synchronized {
      val current = objects.get(key)
      (ifEtag, current) match {
        case (None, None) =>
          objects.put(key, Obj(bytes, 1L)); 1L
        case (None, Some(_)) =>
          conflicts += 1
          throw new CommitConflictException(key, "already exists (If-None-Match: *)")
        case (Some(e), Some(o)) if o.etag == e =>
          objects.put(key, Obj(bytes, e + 1)); e + 1
        case (Some(e), cur) =>
          conflicts += 1
          throw new CommitConflictException(key,
            s"etag moved: expected $e, found ${cur.map(_.etag).getOrElse("absent")}")
      }
    }

  def keys: Seq[String] = objects.keySet.toSeq.sorted
  def size: Int = objects.size
}
