package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Cross-process per-table mutex (SURVEY.md §3.2,
  * `ingestors/base.py:487-620`): an O_EXCL lock file on the shared
  * volume; stale locks (> 12 h) self-clear; a conflict names the
  * holder. Driver-side preflight — Spark executors never touch it.
  */
final class TableLock(lockDir: String, table: String,
                      staleAfterMs: Long = 12L * 3600 * 1000,
                      now: () => Long = System.currentTimeMillis) {

  private val path: Path = Paths.get(lockDir, s".graft_lock_$table")
  private var held = false

  def acquire(holder: String): Either[String, Unit] = {
    Files.createDirectories(path.getParent)
    try {
      Files.write(path, s"$holder\n${now()}".getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      held = true
      Right(())
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val content =
          try new String(Files.readAllBytes(path), StandardCharsets.UTF_8).split("\n")
          catch { case _: Exception => Array("unknown", "0") }
        val lockHolder = content.headOption.getOrElse("unknown")
        val ts = content.lift(1).flatMap(_.trim.toLongOption).getOrElse(0L)
        if (now() - ts > staleAfterMs) {
          // Stale (> 12 h): self-clear and retry once.
          try Files.deleteIfExists(path) catch { case _: Exception => () }
          try {
            Files.write(path, s"$holder\n${now()}".getBytes(StandardCharsets.UTF_8),
              StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
            held = true
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

  def release(): Unit = if (held) {
    try Files.deleteIfExists(path) catch { case _: Exception => () }
    held = false
  }
}
