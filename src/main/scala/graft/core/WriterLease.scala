package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

/** Single-writer fencing for a store directory — the minimum honest
  * version of the reference's shard-ownership story (its ingest nodes
  * divide work by static shard assignment plus optional ZooKeeper locks,
  * `ZKShardLockManager.java`; its STORE never needed commit fencing
  * because Cassandra writes are row-atomic under last-write-wins).
  * graft's store does need it: `SnapshotStore` generation numbering is
  * not CAS-protected, so two facades pointed at one store would race
  * `gen=N` renames with no loud failure.
  *
  * Shape: one `_writer_lock` file at the store root holding
  * `token \n ownerId \n expiresAtMs`. The facade (and therefore
  * `graft.Serve`) ACQUIRES it at construction — a second writer on the
  * same store REFUSES AT BOOT while the lease is live — and heartbeats
  * it at TTL/3. Every [[SnapshotStore.commitStaged]] verifies the fencing
  * token before its first rename: a writer whose lease was taken over
  * (TTL expiry on a hung process, or a same-process crash-restart) has
  * its commits REJECTED loudly, never silently interleaved.
  *
  * Liveness rules, in order:
  *  - no `_writer_lock` → free (and stores never touched by a facade stay
  *    unfenced: direct library use remains single-writer by contract);
  *  - file owner == this process (pid@host) → take over with a fresh
  *    token: no other PROCESS can hold it, and a crashed previous facade
  *    OBJECT in this JVM (the DeferredRollupSpec kill-restart shape) is
  *    indistinguishable in-process from a live one — the takeover marks
  *    any live in-process handle LOST, so a zombie first facade fails
  *    its next heartbeat and every later commit LOUDLY (fenced), never
  *    racing silently;
  *  - foreign owner, lease expired (`expiresAtMs < now`) → take over
  *    with a fresh token (the hung holder's commits fail the token
  *    check from now on);
  *  - foreign owner, live → refuse loudly.
  *
  * Clock caveat (documented, not solved — same as every TTL lease from
  * Chubby on down): expiry compares the holder's own stamp against the
  * taker's clock; keep TTL ≫ plausible skew
  * (`SPARK_GRAFT_WRITER_LEASE_TTL_MS`, default 60 s, heartbeat at /3). */
object WriterLease {

  final class Lease private[WriterLease] (
      val storeDir: String, val token: String, val ownerId: String,
      val ttlMs: Long) {
    /** Set when a takeover or release invalidated this handle: every
      * subsequent [[verifyForTable]] commit under it throws. */
    @volatile private[WriterLease] var lost: Boolean = false
    private[graft] def isLost: Boolean = lost
  }

  def defaultTtlMs: Long =
    sys.env.get("SPARK_GRAFT_WRITER_LEASE_TTL_MS").map(_.toLong)
      .getOrElse(60000L)

  private def ownerId: String = {
    val pid = ProcessHandle.current().pid()
    val host = try java.net.InetAddress.getLocalHost.getHostName
               catch { case _: Exception => "localhost" }
    s"$pid@$host"
  }

  private def key(storeDir: String): String = new Path(storeDir).toString

  def lockPath(storeDir: String): Path =
    new Path(storeDir, "_writer_lock")

  /** The live in-process holder per store root — what
    * [[verifyForTable]] checks commits against (one volatile map read;
    * the lock FILE is only statted/read at acquire/renew, never per
    * commit on the happy path). */
  private val held = new ConcurrentHashMap[String, Lease]()

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The lease a writer ATTRIBUTES its commits to, thread-scoped: the
    * facade brackets each write path (ingest POSTs, drains) in
    * [[withLease]], so a zombie facade object whose handle was taken
    * over IN THE SAME PROCESS is still fenced — the process-wide [[held]]
    * fallback alone would let its commits ride the successor's live
    * lease. Driver-side write paths are single-threaded end to end
    * (handler thread → publish), so a ThreadLocal carries exactly. */
  private val current = new ThreadLocal[Lease]()

  /** Run `f` with its SnapshotStore commits attributed to `lease` (see
    * [[current]]). Nestable; restores the previous attribution. */
  def withLease[T](lease: Lease)(f: => T): T = {
    val prev = current.get()
    current.set(lease)
    try f finally current.set(prev)
  }

  private def readLock(fs: FileSystem, p: Path)
      : Option[(String, String, Long)] =
    try {
      val in = fs.open(p)
      val bytes = try in.readAllBytes() finally in.close()
      new String(bytes, StandardCharsets.UTF_8).split("\n") match {
        case Array(tok, own, exp, _*) => Some((tok, own,
          exp.trim.toLongOption.getOrElse(0L)))
        case _ => None
      }
    } catch { case _: java.io.FileNotFoundException => None }

  private def writeLock(fs: FileSystem, p: Path, overwrite: Boolean,
      token: String, owner: String, expiresAtMs: Long): Unit = {
    val out = fs.create(p, overwrite)
    out.write(s"$token\n$owner\n$expiresAtMs\n"
      .getBytes(StandardCharsets.UTF_8))
    out.close()
  }

  /** Acquire the store's writer lease or throw [[IllegalStateException]]
    * loudly (the second-facade refusal). See the class doc for the
    * liveness rules. */
  def acquire(spark: SparkSession, storeDir: String,
      ttlMs: Long = defaultTtlMs,
      nowMs: () => Long = () => System.currentTimeMillis()): Lease = {
    val k = key(storeDir)
    val p = lockPath(storeDir)
    val fs = fsOf(spark, p)
    fs.mkdirs(new Path(storeDir))
    val our = ownerId
    held.synchronized {
      val inProc = held.get(k)
      readLock(fs, p) match {
        case Some((_, own, exp)) =>
          if (own != our && exp >= nowMs())
            throw new IllegalStateException(
              s"writer lease for $storeDir is held by $own until epoch-ms " +
                s"$exp — refusing to boot a second writer (stop the other " +
                "facade, or let its lease expire if it crashed)")
          // takeover (same-process restart, or a foreign EXPIRED lease):
          // a FRESH token fences the old holder's in-flight commits
          val lease = new Lease(k, java.util.UUID.randomUUID().toString,
            our, ttlMs)
          writeLock(fs, p, overwrite = true, lease.token, our,
            nowMs() + ttlMs)
          if (inProc != null) inProc.lost = true
          held.put(k, lease)
          lease
        case None =>
          val lease = new Lease(k, java.util.UUID.randomUUID().toString,
            our, ttlMs)
          // create-exclusive: a racing writer loses here with a loud
          // FileAlreadyExists; the read-back below is the cheap double
          // check for filesystems with weak create semantics
          try writeLock(fs, p, overwrite = false, lease.token, our,
            nowMs() + ttlMs)
          catch { case e: java.io.IOException =>
            throw new IllegalStateException(
              s"writer lease for $storeDir was taken concurrently — " +
                "refusing", e) }
          val back = readLock(fs, p)
          if (!back.exists(_._1 == lease.token))
            throw new IllegalStateException(
              s"writer lease for $storeDir lost a creation race — refusing")
          if (inProc != null) inProc.lost = true
          held.put(k, lease)
          lease
      }
    }
  }

  /** Heartbeat: extend the lease's expiry stamp. Throws (and marks the
    * handle lost) if the file's token is no longer ours — another writer
    * took over after a missed TTL. */
  def renew(spark: SparkSession, lease: Lease,
      nowMs: () => Long = () => System.currentTimeMillis()): Unit = {
    val p = lockPath(lease.storeDir)
    val fs = fsOf(spark, p)
    held.synchronized {
      if (lease.lost)
        throw new IllegalStateException(
          s"writer lease for ${lease.storeDir} was lost — cannot renew")
      readLock(fs, p) match {
        case Some((tok, _, _)) if tok == lease.token =>
          writeLock(fs, p, overwrite = true, lease.token, lease.ownerId,
            nowMs() + lease.ttlMs)
        case other =>
          lease.lost = true
          held.remove(lease.storeDir, lease)
          throw new IllegalStateException(
            s"writer lease for ${lease.storeDir} was taken over " +
              s"(file now ${other.map(_._2).getOrElse("absent")}) — " +
              "this writer is fenced")
      }
    }
  }

  /** Release: delete the file only if the token is still ours; always
    * invalidate the in-process handle. Idempotent. */
  def release(spark: SparkSession, lease: Lease): Unit = {
    val p = lockPath(lease.storeDir)
    val fs = fsOf(spark, p)
    held.synchronized {
      if (!lease.lost) {
        if (readLock(fs, p).exists(_._1 == lease.token)) fs.delete(p, false)
        lease.lost = true
      }
      held.remove(lease.storeDir, lease)
      ()
    }
  }

  /** Commit-time fencing check for a snapshot TABLE root (e.g.
    * `<store>/metrics_5m`): if the table's parent store carries a
    * `_writer_lock`, this process must hold the live in-process lease
    * whose token matches the FILE — otherwise the commit is rejected.
    * Unfenced stores (no facade ever booted on them) pass untouched, so
    * direct library/test use is unaffected. Called by
    * [[SnapshotStore.commitStaged]] BEFORE its first rename; costs one
    * map read plus one small file read, metadata-cheap next to the
    * staging job it gates. */
  def verifyForTable(spark: SparkSession, tableRoot: Path): Unit = {
    val parent = tableRoot.getParent
    if (parent == null) return
    val p = new Path(parent, "_writer_lock")
    val fs = fsOf(spark, p)
    readLock(fs, p) match {
      case None => ()
      case Some((tok, own, _)) =>
        // attribution order: the thread's bracketing lease (if it is for
        // THIS store) wins over the process-wide holder — that is what
        // fences a same-process zombie whose handle was taken over
        val tl = current.get()
        val l = if (tl != null && tl.storeDir == parent.toString) tl
                else held.get(parent.toString)
        if (l == null || l.isLost || l.token != tok)
          throw new IllegalStateException(
            s"writer-lease fencing: commit to $tableRoot rejected — the " +
              s"store's lease is held by $own with a different token " +
              "(this writer was superseded or never acquired the lease)")
    }
  }

  /** Test seam: the live in-process lease for a store, if any. */
  private[graft] def heldFor(storeDir: String): Option[Lease] =
    Option(held.get(key(storeDir))).filterNot(_.lost)
}
