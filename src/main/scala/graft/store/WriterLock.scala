package graft.store

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path

/** Single-writer guard for a store root: the append/maintain paths are
  * single-writer BY DESIGN — the dictionary anti-join dedup, the
  * downsample partial-merge and the compaction swap all assume no
  * concurrent mutator outside this JVM's [[Store]] append lock. The
  * reference has the same contract one layer down (one writer service owns
  * the inserts; ClickHouse serializes merges per part). This makes the
  * contract EXPLICIT instead of implicit: a `_writer.lock` file created
  * exclusive-mode at the store root, carrying `pid@host` plus the create/
  * heartbeat mtime. A second live process gets a clean refusal instead of
  * racing the dictionary; a crashed holder is detected — same-host dead
  * pid, or a heartbeat older than `staleMs` — and the lock is broken.
  *
  * Filesystem-portable: create-exclusive and delete go through the Hadoop
  * [[org.apache.hadoop.fs.FileSystem]] for the root's URI, so the guard
  * holds on HDFS exactly as on local disk. (On S3A create-exclusive is
  * not atomic — there the lock degrades to an advisory check, which still
  * catches every non-racing double-deployment.)
  */
final class WriterLock(root: String, owner: String = WriterLock.self,
    staleMs: Long = 10 * 60 * 1000) {

  private val path = new Path(root, "_writer.lock")
  @volatile private var held = false
  @volatile private var lastBeatMs = 0L

  private def fs = Store.fsFor(root)._1

  private def writeLock(overwrite: Boolean): Boolean =
    try {
      val out = fs.create(path, overwrite)
      out.write(owner.getBytes(UTF_8))
      out.close()
      true
    } catch { case _: java.io.IOException => false }

  private def holder(): Option[(String, Long)] =
    try {
      val st = fs.getFileStatus(path)
      val in = fs.open(path)
      val buf = new Array[Byte](256)
      val n = in.read(buf)
      in.close()
      Some((new String(buf, 0, math.max(0, n), UTF_8).trim,
        st.getModificationTime))
    } catch { case _: java.io.IOException => None }

  /** Dead = the recorded pid no longer runs on THIS host (a crashed JVM
    * on the same box — the bench/driver fork-per-family shape), or the
    * heartbeat mtime is older than `staleMs` (a crashed holder anywhere).
    */
  private def staleOrDead(who: String, mtimeMs: Long): Boolean = {
    val deadHere = who.split("@") match {
      case Array(pid, host) if host == WriterLock.host =>
        pid.toLongOption.exists(p =>
          !ProcessHandle.of(p).map[Boolean](_.isAlive).orElse(false))
      case _ => false
    }
    deadHere || System.currentTimeMillis() - mtimeMs > staleMs
  }

  /** Acquire the lock, or confirm + heartbeat it when already held by
    * this instance. Throws [[IllegalStateException]] when another LIVE
    * writer owns the root — the caller must not append.
    */
  def ensureHeld(): Unit = synchronized {
    val now = System.currentTimeMillis()
    if (held) {
      // heartbeat: refresh mtime well inside the stale window so a
      // long-lived writer is never mistaken for a crashed one
      if (now - lastBeatMs > staleMs / 4) {
        writeLock(overwrite = true): Unit
        lastBeatMs = now
      }
      return
    }
    fs.mkdirs(new Path(root)): Unit
    if (!writeLock(overwrite = false)) {
      holder() match {
        case Some((who, _)) if who == owner => () // ours (re-entry)
        case Some((who, mtime)) if staleOrDead(who, mtime) =>
          fs.delete(path, false): Unit
          if (!writeLock(overwrite = false))
            throw new IllegalStateException(
              s"store root $root: lost the race re-acquiring a stale lock")
        case Some((who, _)) =>
          throw new IllegalStateException(
            s"store root $root is owned by live writer $who; " +
              "refusing concurrent writes (one process owns a store root)")
        case None => // holder vanished between probe and read: retry once
          if (!writeLock(overwrite = false))
            throw new IllegalStateException(
              s"store root $root: lock contended; refusing concurrent writes")
      }
    }
    held = true
    lastBeatMs = now
    WriterLock.releaseOnExit(this)
  }

  def isHeld: Boolean = held

  def release(): Unit = synchronized {
    if (held) {
      try fs.delete(path, false): Unit
      catch { case _: java.io.IOException => () }
      held = false
    }
  }
}

object WriterLock {
  private[store] val host: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: Throwable => "localhost" }

  private def self: String = s"${ProcessHandle.current().pid()}@$host"

  // best-effort tidy exit (a kill -9 skips this; staleOrDead covers it)
  private val exiting = TrieMap[WriterLock, Unit]()
  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => exiting.keys.foreach(l =>
      try l.release() catch { case _: Throwable => () }), "graft-lock-release"))

  private def releaseOnExit(l: WriterLock): Unit = {
    hook
    exiting.put(l, ()): Unit
  }
}
