package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** Shared staging machinery for the persisted /tmp parquet stores
  * (louvain labels, dedup cluster labels, audio landmark index, …).
  *
  * Two hazards the naive `write.mode("overwrite").parquet(path)` +
  * JVM-local staged-set pattern left open:
  *
  *   1. A CONCURRENT JVM (parallel test fork, `Verify` running next
  *      to `sbt test`) could read the store directory mid-overwrite
  *      and see a half-written parquet dir. Fixed by an atomic
  *      publish: the build writes to a fresh pid-suffixed temp dir,
  *      which is then `ATOMIC_MOVE`-renamed over the final path —
  *      readers only ever observe a complete store.
  *   2. Two DISTINCT data dirs whose sanitized names collide (e.g.
  *      `/a/b` vs `/a_b`) silently shared one store subdir. Fixed by
  *      suffixing a hash of the RAW dir string into the path, and by
  *      keying the staged set on the final (collision-free) path.
  *
  * The per-JVM staged set still means every JVM rebuilds each store
  * on its own first call — a store left by older code is never
  * trusted (the store-op convention the oracle gate relies on).
  */
private[graft] object StoreStage {

  private val staged = scala.collection.mutable.Set.empty[String]

  /** Collision-free store subpath for data dir `d` under `root`:
    * human-readable sanitized name + a hash of the raw string. */
  def path(root: String, d: String): String = {
    val h = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(d))
    s"$root/${d.replaceAll("[^A-Za-z0-9]", "_")}_$h"
  }

  /** Build-if-unstaged with an atomic publish. `build` receives the
    * TEMP directory to write into; on return the temp dir is renamed
    * over the final path. Returns the final store path. */
  def ensure(root: String, d: String)(build: String => Unit): String =
    synchronized {
      val p = path(root, d)
      if (!staged.contains(p)) {
        val tmp = p + ".build-" + ProcessHandle.current().pid()
        deleteRec(Paths.get(tmp))
        build(tmp)
        publish(Paths.get(tmp), Paths.get(p))
        staged += p
      }
      p
    }

  /** Atomically rename `tmp` over `dst`. If another JVM republishes
    * `dst` between our delete and move (DirectoryNotEmpty), retry;
    * after the retries, an EXISTING dst is accepted — any published
    * dir is complete by construction, and the content is a pure
    * function of (code, data dir) so concurrent same-session builds
    * agree. */
  private def publish(tmp: Path, dst: Path): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      attempt += 1
      deleteRec(dst)
      try {
        try Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.AtomicMoveNotSupportedException =>
            Files.move(tmp, dst)
        }
        done = true
      } catch {
        case e: java.nio.file.FileSystemException =>
          if (attempt >= 3) {
            deleteRec(tmp)
            if (!Files.isDirectory(dst)) throw e
            done = true // a rival JVM's complete publish — accept it
          }
      }
    }
  }

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
}
