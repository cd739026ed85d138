package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Cross-process per-table mutex (SURVEY.md §3.2,
  * `ingestors/base.py:487-620`): an O_EXCL lock file on the shared
  * volume; stale locks (> 12 h) self-clear; a conflict names the
  * holder. Driver-side preflight — Spark executors never touch it.
  *
  * Stale-cleanup races: takeover is an ATOMIC tombstone move whose
  * winner verifies it moved the stale content, and every successful
  * CREATE_NEW acquire re-reads the file and confirms it still holds
  * its own content before claiming — so a racer whose fresh lock was
  * swept into a tombstone reports a conflict instead of proceeding as
  * a second owner. Residual window: plain-file locking cannot make
  * verify-then-ingest atomic, so a sweep landing in the instant
  * between the re-read and first use is undetected; with a 12 h stale
  * horizon that requires a clock skewed by half a day, accepted as the
  * same trade-off the reference makes with bare O_EXCL files.
  */
final class TableLock(lockDir: String, table: String,
                      staleAfterMs: Long = 12L * 3600 * 1000,
                      now: () => Long = System.currentTimeMillis,
                      readFile: Path => Array[Byte] = Files.readAllBytes(_)) {

  private val path: Path = Paths.get(lockDir, s".graft_lock_$table")
  private var held = false
  private var myContent: String = ""
  private var acquiredAt = 0L

  private def readWithRetry(p: Path, attempts: Int = 3): Option[String] = {
    var i = 0
    while (i < attempts) {
      try return Some(new String(readFile(p), StandardCharsets.UTF_8))
      catch {
        case _: Exception =>
          i += 1
          if (i < attempts) Thread.sleep(5L << i)
      }
    }
    None
  }

  private def writeLock(holder: String): Unit = {
    myContent = s"$holder\n${now()}"
    Files.write(path, myContent.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    // Re-verify before claiming: a stale-cleanup racer mis-timing its
    // ATOMIC_MOVE can sweep OUR fresh lock into its tombstone, and a
    // third process may then CREATE_NEW the path. If the file no
    // longer holds our content we were swept — surface it as a
    // conflict rather than proceed as a second owner.
    //
    // A TRANSIENT read failure must not be treated as "swept": our
    // CREATE_NEW above succeeded, so giving up here would leave our own
    // fresh lock on disk with held=false — an orphan that blocks the
    // table for the whole stale horizon with nothing to release it.
    // The read is retried; only a SUCCESSFUL read showing other content
    // concludes "swept".
    readWithRetry(path) match {
      case Some(c) if c == myContent =>
        acquiredAt = now()
        held = true
      case Some(_) =>
        throw new java.nio.file.FileAlreadyExistsException(path.toString)
      case None =>
        // Persistently unreadable. Almost certainly our own fresh file,
        // but NOT provably: a sweeper that read the PREVIOUS stale lock
        // can have tombstoned ours and a third process re-created the
        // path (no clock skew required), so a blind delete could
        // destroy a live foreign lock — breaking mutual exclusion,
        // which outranks availability. Instead PARK the file in a
        // quarantine tombstone (atomic, nothing destroyed), then try
        // once more to identify it out-of-line: ours → discard (table
        // freed, no 12 h orphan); foreign → restore via CREATE_NEW
        // (never clobbers a newer lock; on failure the quarantine file
        // keeps the only copy, same documented trade-off as the
        // stale-sweep tombstone); still unreadable → leave it parked.
        val quarantine = path.resolveSibling(
          s"${path.getFileName}.unreadable.${now()}.${ProcessHandle.current().pid()}")
        try {
          Files.move(path, quarantine,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          readWithRetry(quarantine) match {
            case Some(c) if c == myContent =>
              Files.deleteIfExists(quarantine)
            case Some(foreign) =>
              try {
                Files.write(path, foreign.getBytes(StandardCharsets.UTF_8),
                  StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
                Files.deleteIfExists(quarantine)
              } catch { case _: Exception => () }
            case None => ()
          }
        } catch { case _: Exception => () }
        throw new java.nio.file.FileAlreadyExistsException(path.toString)
    }
  }

  /** Every failure mode surfaces as Left — including IO failures
    * OUTSIDE the lock protocol (read-only volume, AccessDenied,
    * vanished parent): a raw exception here would escape the caller's
    * structured RunResult/exit-code contract the same way a missing
    * source path once did.
    */
  def acquire(holder: String): Either[String, Unit] = try {
    Files.createDirectories(path.getParent)
    try {
      writeLock(holder)
      Right(())
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val staleRaw =
          try new String(readFile(path), StandardCharsets.UTF_8)
          catch { case _: Exception => "unknown\n0" }
        val content = staleRaw.split("\n")
        val lockHolder = content.headOption.getOrElse("unknown")
        val ts = content.lift(1).flatMap(_.trim.toLongOption).getOrElse(0L)
        if (now() - ts > staleAfterMs) {
          // Stale (> 12 h): self-clear via an ATOMIC tombstone move, not
          // a bare delete — two racers that both read the stale content
          // would otherwise both delete-and-recreate, and the second
          // delete removes the first racer's FRESH lock (two holders).
          // ATOMIC_MOVE lets exactly one racer take the file; the winner
          // verifies it moved the stale content (not a racer's fresh
          // lock written in between) before claiming.
          val tomb = path.resolveSibling(
            s"${path.getFileName}.stale.${now()}.${ProcessHandle.current().pid()}")
          val tookStale =
            try {
              Files.move(path, tomb, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              val moved = new String(readFile(tomb), StandardCharsets.UTF_8)
              if (moved == staleRaw) {
                Files.deleteIfExists(tomb); true
              } else {
                // We grabbed a racer's fresh lock — restore it WITHOUT
                // clobbering: an overwriting move would silently replace
                // a THIRD holder's lock written in between (two owners
                // again). CREATE_NEW only succeeds when the path is
                // absent; if it isn't, leave the tombstone on disk — it
                // is the only copy of the racer's live lock, and an
                // orphaned tombstone file is harmless where a deleted
                // live lock is not.
                try {
                  Files.write(path, moved.getBytes(StandardCharsets.UTF_8),
                    StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
                  Files.deleteIfExists(tomb)
                } catch { case _: Exception => () }
                false
              }
            } catch { case _: Exception => false }
          if (!tookStale)
            Left(s"Table '$table' is locked by another ingest (raced on stale-lock cleanup)")
          else
            try {
              writeLock(holder)
              Right(())
            } catch {
              case _: java.nio.file.FileAlreadyExistsException =>
                Left(s"Table '$table' is locked by another ingest (raced on stale-lock cleanup)")
            }
        } else
          Left(s"Table '$table' is locked by '$lockHolder' " +
            s"(lock age ${(now() - ts) / 1000}s; stale after ${staleAfterMs / 1000}s)")
    }
  } catch {
    case scala.util.control.NonFatal(e) =>
      Left(s"Table '$table' lock unavailable: ${e.getClass.getSimpleName}: " +
        s"${e.getMessage}")
  }

  /** Delete only OUR lock: if another run stale-cleared it and wrote
    * its own, leave theirs in place (the content check prevents run A
    * from clobbering run B's lock after a 12 h takeover).
    *
    * The verify read rides the same retry as acquire. If it STILL
    * fails, the file is deleted anyway when our hold is younger than
    * the stale horizon — inside the horizon no other process can have
    * legitimately taken the lock over, so the unreadable file can only
    * be ours, and leaving it would orphan-block the table for the rest
    * of the horizon. Past the horizon (a > 12 h run) a takeover is
    * possible and the file is left in place.
    */
  def release(): Unit = if (held) {
    try {
      readWithRetry(path) match {
        case Some(current) =>
          if (current == myContent) Files.deleteIfExists(path)
        case None =>
          if (now() - acquiredAt < staleAfterMs) Files.deleteIfExists(path)
      }
    } catch { case _: Exception => () }
    held = false
  }
}
