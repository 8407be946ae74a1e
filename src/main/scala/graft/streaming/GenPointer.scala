package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** Pointer-commit primitive of the generation state layout.
  *
  * The layout keeps all state data in immutable `gen=N/` dirs; the
  * ONLY mutation that commits a batch is publishing a new value of one
  * tiny pointer object. This trait isolates that publish behind the
  * object-store consistency model, so the data plane never depends on
  * rename atomicity:
  *
  *  - `read` returns the committed generation together with an OPAQUE
  *    VERSION TOKEN (the etag a real store returns with a GET).
  *  - `putIf` is the CONDITIONAL PUT: it commits `gen` iff the
  *    pointer's version is still exactly the token the caller read
  *    (HTTP `If-Match`; `expect = None` is create-if-absent,
  *    `If-None-Match: *`). A `false` return means another publisher
  *    committed since the read — the caller MUST NOT treat its write
  *    as committed. That read→write-data→conditional-flip protocol is
  *    what rejects lost updates: of two concurrent publishers that
  *    resolved the same pointer version, exactly one flip succeeds and
  *    the other fails loudly instead of silently orphaning the
  *    winner's generation (GenPointerSpec drives the race against a
  *    fake object store).
  *
  * Production default is [[PosixGenPointer]] (local FS / HDFS). An
  * S3/GCS deployment binds a store backed by the service's native
  * conditional PUT (`If-Match` on S3, `x-goog-if-generation-match` on
  * GCS) via [[GenPointerStore.bind]] — nothing else in the layout
  * changes, because generation data files are written once and never
  * renamed.
  */
trait GenPointerStore {
  /** Committed generation + version token, or None if never committed. */
  def read(statePath: String): Option[(Long, String)]

  /** Conditional PUT of the pointer: commit `gen` iff the current
    * version token equals `expect` (None = the pointer must not exist
    * yet). Returns false when the condition fails — a concurrent
    * publisher won the race. */
  def putIf(statePath: String, gen: Long, expect: Option[String]): Boolean
}

object GenPointerStore {
  private val overrides =
    new java.util.concurrent.ConcurrentHashMap[String, GenPointerStore]()

  /** Route one state path's pointer through a non-default store (an
    * object-store binding, or a fake store under test). Bindings are
    * per-path so concurrently-running state dirs can mix backends. */
  def bind(statePath: String, store: GenPointerStore): Unit =
    overrides.put(statePath, store)

  def unbind(statePath: String): Unit = overrides.remove(statePath)

  private[streaming] def forPath(statePath: String): GenPointerStore =
    overrides.getOrDefault(statePath, PosixGenPointer)
}

/** The local-FS / HDFS pointer store: the pointer is a one-line
  * `_graft_current` file, reads are plain (rename keeps them atomic),
  * and the conditional PUT is a read-compare-write-rename under an
  * advisory file lock — a REAL compare-and-set, not just an atomic
  * blind write, so even on POSIX two racing publishers resolve to
  * exactly one winner. The version token is the pointer content
  * itself: generations are strictly monotonic (publishers only ever
  * propose current+1), so a value can never recur and content equality
  * is a sound version check (no ABA).
  */
object PosixGenPointer extends GenPointerStore {
  private[graft] val Marker = "_graft_current"

  // JVM-level monitor per path (java FileLock is per-process: a second
  // lock attempt from the SAME JVM throws instead of blocking), then
  // the cross-process file lock
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def withLock[A](statePath: String)(body: => A): A = {
    val mon = monitors.computeIfAbsent(statePath, _ => new Object)
    mon.synchronized {
      val dir = new java.io.File(statePath)
      if (!dir.isDirectory) dir.mkdirs()
      val ch = java.nio.channels.FileChannel.open(
        new java.io.File(dir, Marker + "_lock").toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val l = ch.lock()
        try body finally l.release()
      } finally ch.close()
    }
  }

  def read(statePath: String): Option[(Long, String)] = {
    val f = new java.io.File(statePath, Marker)
    if (!f.exists()) None
    else {
      val s = new String(Files.readAllBytes(f.toPath), UTF_8).trim
      Some((s.toLong, s))
    }
  }

  def putIf(statePath: String, gen: Long,
      expect: Option[String]): Boolean = withLock(statePath) {
    if (read(statePath).map(_._2) != expect) false
    else {
      val tmp = new java.io.File(statePath, Marker + "_tmp")
      Files.write(tmp.toPath, gen.toString.getBytes(UTF_8))
      require(tmp.renameTo(new java.io.File(statePath, Marker)),
        s"generation pointer rename failed under $statePath")
      true
    }
  }
}
