package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Shared filesystem lease — the writer-serialization primitive behind
 * [[Layout.appendWithManifest]] (r10) and the snapshot store's
 * vacuum/commit guard (r11). One lease file = one critical section;
 * holders are identified by a token the file carries, so every
 * mutation point can FENCE (re-verify ownership immediately before
 * the shared mutation) and abort fail-safe if the lease was broken.
 *
 * Protocol (all raw-filesystem-safe, no coordination service):
 *  - ACQUIRE: write the token to a UNIQUE temp file, re-check the
 *    lock is ABSENT, RENAME the temp onto the lock path, then VERIFY
 *    ownership by settled read-back. The rename indirection is
 *    load-bearing on ChecksumFileSystem (every local `file://`
 *    deployment): two processes calling `create(lock,
 *    overwrite = false)` on the SAME path race the data file and its
 *    `.crc` sibling INDEPENDENTLY — the loser's checksum stream can
 *    land beside the winner's data, leaving a complete, valid-looking
 *    lease that every subsequent read fails with ChecksumException.
 *    Nobody owns it (the winner's read-back failed too), nobody can
 *    read it, and it only ages out at `leaseMs` — a wedged lock
 *    (observed live in stress leg 18, r11). Writing the pair ONCE
 *    under a contention-free unique name and renaming keeps data+crc
 *    consistent through a SINGLE claim; two claims racing the rename
 *    itself can still interleave one's data with the other's crc
 *    (the checksum fs renames them as two steps) — that residue is
 *    healed by the unreadable-grace break below instead of wedging
 *    the lock for the term.
 *    The explicit ABSENT check before the rename is what makes the
 *    claim no-clobber on EVERY deployment: `fs.rename` onto an
 *    existing file is NOT uniformly refused — HDFS refuses it, Hive's
 *    ProxyLocalFileSystem refuses via its own (non-atomic) isFile
 *    guard, but Hadoop's RawLocalFileSystem delegates to POSIX
 *    rename(2), which silently OVERWRITES (empirically verified on
 *    this deployment's raw local fs). Without the gate, a polling
 *    waiter on such a filesystem would clobber a LIVE holder's lease
 *    on every iteration and both sides would believe they own the
 *    critical section. With the gate, a rename is only ever attempted
 *    onto an observed-vacant path, so a steal requires two claimants
 *    inside the same stat→rename instant; the settled read-back
 *    arbitrates that residual race to one winner (the earlier rename
 *    reads back the later claimant's token and retries), and the
 *    holder's pre-mutation fence is the backstop for the pathological
 *    remainder (a claimant stalled between its absent-check and its
 *    rename for longer than the settle), as it already is for
 *    erroneous staleness breaks — no raw filesystem offers an atomic
 *    no-clobber rename to build on.
 *  - STALENESS is judged from the lease FILE's filesystem
 *    modification time, not a clock stamp embedded by the holder
 *    (the r10 scheme): the FS assigns mtime from ONE clock source
 *    (the namenode / local kernel), so every waiter ages the same
 *    lease identically, and cross-driver clock skew only enters
 *    through the waiter's own `now` — one clock pair, not two. Size
 *    `leaseMs` above the longest expected critical section PLUS the
 *    worst driver-vs-FS clock skew; the holder's pre-mutation fence
 *    is the backstop for an erroneous break.
 *  - BREAK a stale lease by RENAME-to-unique-tombstone, never a bare
 *    delete: two waiters deciding "stale" concurrently would both
 *    reach a delete, and the loser's delete could land AFTER the
 *    winner's fresh create — removing a LIVE lease and letting two
 *    writers in. A rename is claimed by exactly one waiter.
 *  - RELEASE only a lease the caller still owns, by rename-verify-
 *    delete (a bare read-then-delete could delete a lease a breaker
 *    installed between the read and the delete); a KNOWN-foreign
 *    lease is never touched.
 *
 * The lease file content is `<owner-token> <epoch-millis>`; the
 * stamp is diagnostic only (who acquired when) — staleness never
 * reads it.
 */
private[graft] object Lease {

  /** How long a lease may read as garbled/empty before any waiter may
    * break it regardless of lease-term staleness — long enough that a
    * live claim's mid-rename window (microseconds, fresh mtime) and a
    * reader's retried transient hiccups can never qualify, short
    * enough that a torn data/crc pair (racing claims) or a crashed
    * mid-claim writer heals in about a second instead of wedging the
    * lock for the whole term. */
  private val UnreadableGraceMs = 1000L

  /** Test-only stall injection (r12 verdict #1): invoked with the
    * claimant's token between its observed-ABSENT check and its claim
    * rename — the residual steal window no raw filesystem can close
    * (POSIX rename(2) silently clobbers; there is no atomic no-clobber
    * rename to build on). The stall spec parks a claimant here while
    * another claims and holds, then proves the displaced holder's
    * pre-mutation FENCE (not the lease protocol itself) is what keeps
    * exactly one mutation committing. Default no-op; never set outside
    * tests. */
  @volatile private[graft] var stallBeforeRename: String => Unit = _ => ()

  /** Acquire the lease at `lock`, returning the owner token; throws
    * after `timeoutMs` of contention. A lease file older than
    * `leaseMs` (by fs mtime) is broken as crashed. */
  def acquire(fs: FileSystem, lock: Path,
              timeoutMs: Long, leaseMs: Long): String = {
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + timeoutMs
    while (true) {
      val now = System.currentTimeMillis()
      val st = statusAndContent(fs, lock)
      // self-recognition: a prior iteration's rename may have LANDED
      // while its read-back hiccuped (transient checksum/listing
      // races under heavy polling) — a lock already carrying OUR
      // token is ours, not contention
      st.foreach { case (_, c) => if (c.startsWith(token)) return token }
      // stale = fs-mtime aged past leaseMs: break by rename-to-
      // unique-tombstone. A lease that reads as GARBLED/EMPTY is
      // additionally breakable after a short grace (UnreadableGraceMs
      // since its last mtime): nobody can own an unreadable lease —
      // owner tokens are non-empty and a live holder's pair is
      // consistent — so it is either a crashed claimant or a TORN
      // data/crc pair from two claimants passing the absent-check in
      // the same instant (ChecksumFileSystem renames the data file
      // and its .crc sibling as two separate steps, so racing renames
      // can interleave one's data with the other's crc — observed
      // under the contended-handoff spec on a loaded host). Waiting
      // out the full leaseMs for those (the r11 behavior) wedges the
      // lock for the whole term. The grace keeps live claims safe: a
      // mid-rename window is microseconds and carries a FRESH mtime,
      // and content() has already retried transient read hiccups; the
      // double-stat (same mtime) narrows decide-vs-act, and the
      // holder's fencing re-verify is the backstop for what no raw
      // filesystem can make atomic.
      st.foreach { case (mtime, c) =>
        val tornTooLong = c.isEmpty && now - mtime > UnreadableGraceMs
        if ((now - mtime > leaseMs || tornTooLong) &&
          statusAndContent(fs, lock).exists(_._1 == mtime)) {
          val tomb = new Path(lock.getParent,
            s".${lock.getName}.broken.$token")
          if (scala.util.Try(fs.rename(lock, tomb)).getOrElse(false))
            fs.delete(tomb, false)
        }
      }
      // claim via unique-temp + observed-absent + rename (see the
      // protocol note: a direct create-exclusive on the shared path
      // can tear the data/crc pair under contention and wedge the
      // lock, and a bare rename CLOBBERS a live lease on POSIX-rename
      // filesystems). The temp is written FIRST so the absent-check
      // sits immediately against the rename — the narrowest
      // stat→rename window a raw filesystem allows.
      val tmp = new Path(lock.getParent, s".${lock.getName}.acq.$token")
      val created =
        try {
          val out = fs.create(tmp, false)
          try out.write(s"$token $now".getBytes("UTF-8"))
          finally out.close()
          !fs.exists(lock) && {
            stallBeforeRename(token)
            scala.util.Try(fs.rename(tmp, lock)).getOrElse(false)
          }
        } catch { case _: java.io.IOException => false }
      if (!created) scala.util.Try(fs.delete(tmp, false))
      if (created) {
        Thread.sleep(20)
        if (content(fs, lock).exists(_.startsWith(token))) return token
      }
      if (System.currentTimeMillis() >= deadline)
        throw new IllegalStateException(
          s"could not acquire lease $lock in ${timeoutMs}ms — another " +
            "writer holds it (or raise leaseMs breakage)")
      Thread.sleep(50)
    }
    token // unreachable
  }

  /** Ownership check for fencing points: true iff the lease file
    * currently carries `token`. */
  def holds(fs: FileSystem, lock: Path, token: String): Boolean =
    content(fs, lock).exists(_.startsWith(token))

  /** Release only a lease this caller still owns — see the protocol
    * note above. If the rename grabbed a FOREIGN lease (ours was
    * broken mid-release and replaced), it is restored; a failed
    * restore (a newer lease landed meanwhile) deletes the displaced
    * copy — its owner's own fencing re-verify will abort it. */
  def release(fs: FileSystem, lock: Path, token: String): Unit = {
    // a KNOWN-foreign lease is never touched: unconditionally renaming
    // it aside (even with a restore) would leave the lock path vacant
    // for a polling waiter's create, and a failed restore would then
    // delete the live owner's lease — two writers in. The rename
    // dance below only closes the residual read-vs-delete TOCTOU for
    // a lease that still READS as ours.
    if (!holds(fs, lock, token)) return
    val tomb = new Path(lock.getParent,
      s".${lock.getName}.released.$token")
    if (scala.util.Try(fs.rename(lock, tomb)).getOrElse(false)) {
      if (holds(fs, tomb, token)) fs.delete(tomb, false)
      // restore a grabbed FOREIGN lease — but never by renaming onto
      // an even newer claim (POSIX rename would clobber it; see the
      // acquire note): observed-occupied means the displaced copy is
      // already superseded, so it is deleted and its owner's fencing
      // re-verify aborts it
      else if (fs.exists(lock) ||
        !scala.util.Try(fs.rename(tomb, lock)).getOrElse(false))
        scala.util.Try(fs.delete(tomb, false))
    }
  }

  /** Lease file content, None if missing/empty/unreadable. Transient
    * IOExceptions (a reader racing a claim's rename) are retried a
    * few times before concluding unreadable — treating a hiccup as
    * definitive is how a release declines to release and wedges the
    * lock for a full leaseMs. */
  private def content(fs: FileSystem, lock: Path): Option[String] = {
    var attempt = 0
    while (true) {
      try {
        if (!fs.exists(lock)) return None
        val in = fs.open(lock)
        val buf = new Array[Byte](128)
        val n = try in.read(buf) finally in.close()
        return if (n <= 0) None
        else Some(new String(buf, 0, n, "UTF-8").trim)
      } catch {
        case _: java.io.FileNotFoundException => return None
        case _: java.io.IOException =>
          if (attempt >= 4) return None
          attempt += 1
          Thread.sleep(20)
      }
    }
    None // unreachable
  }

  /** (fs mtime, content or "" if unreadable) of the lease file; None
    * if it does not exist. The mtime is the staleness clock; the
    * content is carried for diagnostics. */
  private def statusAndContent(fs: FileSystem,
                               lock: Path): Option[(Long, String)] =
    try {
      val st = fs.getFileStatus(lock)
      Some((st.getModificationTime, content(fs, lock).getOrElse("")))
    } catch {
      case _: java.io.FileNotFoundException => None
      case _: java.io.IOException => None
    }
}
