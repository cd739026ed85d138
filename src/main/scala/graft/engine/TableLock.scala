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
    // So: retry the read briefly; only a SUCCESSFUL read showing other
    // content concludes "swept". If the path stays unreadable after the
    // retries, delete our own file before surfacing the failure — a
    // fresh lock cannot legitimately have been stale-swept inside this
    // window (that would need the half-day clock skew the class
    // docstring already rules out), so the unreadable file is ours.
    var verified: Option[Boolean] = None // Some(ours?) once a read lands
    var attempt = 0
    while (verified.isEmpty && attempt < 3) {
      try verified = Some(
        new String(readFile(path), StandardCharsets.UTF_8) == myContent)
      catch {
        case _: Exception =>
          attempt += 1
          if (attempt < 3) Thread.sleep(5L << attempt)
      }
    }
    verified match {
      case Some(true) => held = true
      case Some(false) =>
        throw new java.nio.file.FileAlreadyExistsException(path.toString)
      case None =>
        try Files.deleteIfExists(path) catch { case _: Exception => () }
        throw new java.nio.file.FileAlreadyExistsException(path.toString)
    }
  }

  def acquire(holder: String): Either[String, Unit] = {
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
  }

  /** Delete only OUR lock: if another run stale-cleared it and wrote
    * its own, leave theirs in place (the content check prevents run A
    * from clobbering run B's lock after a 12 h takeover).
    */
  def release(): Unit = if (held) {
    try {
      val current = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      if (current == myContent) Files.deleteIfExists(path)
    } catch { case _: Exception => () }
    held = false
  }
}
