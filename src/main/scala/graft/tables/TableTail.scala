package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Incremental consumer of a [[SnapshotTable]]: delivers each
  * committed version's CHANGE FEED ([[SnapshotTable.changesBetween]])
  * exactly once across process restarts — the table-as-stream
  * counterpart of appendOnce's stream-as-table direction.
  *
  * The cursor (last fully-delivered version) is persisted in the
  * consumer's own checkpoint dir via write-tmp + atomic rename, and is
  * advanced only AFTER the handler returns: a crash mid-handler
  * re-delivers that version on restart (at-least-once at the handler
  * boundary), while a handler that completed is never re-delivered —
  * the same contract Structured Streaming gives foreachBatch, with the
  * version number playing the batchId role, so an idempotent handler
  * (e.g. [[SnapshotTable.appendOnce]] into a downstream table keyed on
  * the version) composes to end-to-end exactly-once.
  *
  * Each poll is O(new data): version discovery is a manifest listing
  * and every delivery reads only that version's added files. Drive it
  * from any scheduler — [[graft.streaming.ScheduledRunner]] gives the
  * reference's scheduled-invocation shape (task.ts:76).
  */
final class TableTail(table: SnapshotTable, checkpointDir: String) {
  private val dir: Path = Paths.get(checkpointDir)
  Files.createDirectories(dir)
  private val cursorPath = dir.resolve("version-cursor")

  /** Last version whose handler completed (0 = nothing delivered). */
  def cursor: Long =
    if (Files.exists(cursorPath))
      new String(Files.readAllBytes(cursorPath), "UTF-8").trim.toLong
    else 0L

  private def advance(v: Long): Unit = {
    val tmp = dir.resolve(s".cursor-tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, v.toString.getBytes("UTF-8"))
    Files.move(tmp, cursorPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Deliver every undelivered version's change feed, one call per
    * version in commit order; returns the number delivered. The
    * handler sees (version, addedRows). */
  def poll(onVersion: (Long, DataFrame) => Unit): Int = {
    val latest = table.currentVersion
    var v = cursor
    var delivered = 0
    while (v < latest) {
      val next = v + 1
      onVersion(next, table.changesBetween(v, next))
      advance(next)
      delivered += 1
      v = next
    }
    delivered
  }
}
