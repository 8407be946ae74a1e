package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** Pointer-commit primitive of the generation state layout.
  *
  * The layout keeps all state data in immutable `gen=<label>/` dirs;
  * the ONLY mutation that commits a batch is publishing a new value of
  * one tiny pointer object. This trait isolates that publish behind
  * the object-store consistency model, so the data plane never depends
  * on rename atomicity:
  *
  *  - `read` returns the committed generation's DIR LABEL together
  *    with an OPAQUE VERSION TOKEN (the etag a real store returns with
  *    a GET). The label names the committed dir (`gen=<label>`) and
  *    carries the generation NUMBER as its numeric prefix
  *    ([[GenPointerStore.genOf]]); since r19 a fresh publish appends a
  *    publisher-unique nonce (`N-<nonce>`), so two publishers that
  *    race the same generation number write into PHYSICALLY DISTINCT
  *    dirs — the loser's data writes can never land in (let alone
  *    clobber) the dir the winner committed. Only the pointer names
  *    which one is state.
  *  - `putIf` is the CONDITIONAL PUT: it commits `label` iff the
  *    pointer's version is still exactly the token the caller read
  *    (HTTP `If-Match`; `expect = None` is create-if-absent,
  *    `If-None-Match: *`). A `false` return means another publisher
  *    committed since the read — the caller MUST NOT treat its write
  *    as committed. That read→write-data→conditional-flip protocol is
  *    what rejects lost updates: of two concurrent publishers that
  *    resolved the same pointer version, exactly one flip succeeds and
  *    the other fails loudly; its uniquely-named generation dir is an
  *    unreferenced orphan, GC'd once the retention cutoff passes its
  *    generation number (GenPointerSpec drives the race against a fake
  *    object store and asserts the winner's dir holds ONLY the
  *    winner's files).
  *
  * Production default is [[PosixGenPointer]] (local FS / HDFS). An
  * S3/GCS deployment binds a store backed by the service's native
  * conditional PUT (`If-Match` on S3, `x-goog-if-generation-match` on
  * GCS) via [[GenPointerStore.bind]] — nothing else in the layout
  * changes, because generation data files are written once and never
  * renamed.
  */
trait GenPointerStore {
  /** Committed generation's (dir label, version token), or None if
    * never committed. The label's numeric prefix is the generation
    * number; the token is opaque (etag). */
  def read(statePath: String): Option[(String, String)]

  /** Conditional PUT of the pointer: commit `label` iff the current
    * version token equals `expect` (None = the pointer must not exist
    * yet). Returns false when the condition fails — a concurrent
    * publisher won the race. */
  def putIf(statePath: String, label: String, expect: Option[String]): Boolean
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

  /** Generation NUMBER of a dir label: its numeric prefix (`"7"` and
    * `"7-a3f29c"` both → 7). Throws on a label with no numeric prefix
    * — such a name was never produced by a publisher. */
  private[graft] def genOf(label: String): Long = {
    val digits = label.takeWhile(_.isDigit)
    require(digits.nonEmpty, s"generation label '$label' has no " +
      "numeric prefix — not a publisher-written label")
    digits.toLong
  }
}

/** The local-FS / HDFS pointer store: the pointer is a one-line
  * `_graft_current` file, reads are plain (rename keeps them atomic),
  * and the conditional PUT is a read-compare-write-rename under an
  * advisory file lock — a REAL compare-and-set, not just an atomic
  * blind write, so even on POSIX two racing publishers resolve to
  * exactly one winner. The version token is the pointer content (the
  * dir label) itself: labels carry a strictly monotonic numeric prefix
  * (publishers only ever propose current+1) plus a publisher-unique
  * nonce, so a value can never recur and content equality is a sound
  * version check (no ABA).
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

  def read(statePath: String): Option[(String, String)] = {
    val f = new java.io.File(statePath, Marker)
    if (!f.exists()) None
    else {
      val s = new String(Files.readAllBytes(f.toPath), UTF_8).trim
      Some((s, s))
    }
  }

  def putIf(statePath: String, label: String,
      expect: Option[String]): Boolean = withLock(statePath) {
    if (read(statePath).map(_._2) != expect) false
    else {
      val tmp = new java.io.File(statePath, Marker + "_tmp")
      Files.write(tmp.toPath, label.getBytes(UTF_8))
      require(tmp.renameTo(new java.io.File(statePath, Marker)),
        s"generation pointer rename failed under $statePath")
      true
    }
  }
}
