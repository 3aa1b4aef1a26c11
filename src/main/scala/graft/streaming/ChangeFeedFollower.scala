package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.store.FeatureStore

/** Subscribe to a table's CHANGE FEED: a poll loop that delivers each
  * newly committed version's change rows ([[FeatureStore.getChanges]])
  * to a handler, exactly once per version, in commit order — the
  * consume side of the CDC story ([[StreamingIngest.startUpsert]]
  * being the produce side). Downstream materializations (an online
  * store, a search index, an aggregate cache) apply the insert/delete
  * rows instead of re-reading snapshots.
  *
  * Delivery contract: versions are delivered strictly in order, each
  * at most once per follower; `fromVersion` is the resume cursor (pass
  * the last version your sink durably applied — restart-safe by
  * construction, no follower-side state to lose). A version pruned
  * before the follower reached it (follower lagging beyond the
  * retention window) fails the follower loudly via `onError` rather
  * than silently skipping committed changes.
  *
  * Scale shape: each poll is one catalog read (driver-only, O(1));
  * each delivery plans O(changes of that version) work (the recorded
  * change sets / fast paths of [[FeatureStore.getChanges]]) — the
  * follower never rescans the table. Polling suits the store's
  * commit granularity (versions, not rows); sub-second latency wants
  * the streaming ingest path's own foreachBatch instead.
  */
final class ChangeFeedFollower private (
    store: FeatureStore,
    name: String,
    fromVersion: Int,
    pollMillis: Long,
    onChanges: (DataFrame, Int) => Unit,
    onError: Throwable => Unit) extends AutoCloseable {

  @volatile private var cursor = fromVersion
  @volatile private var running = true

  /** Last version delivered to the handler. */
  def position: Int = cursor

  private val thread = new Thread(() => {
    while (running) {
      try {
        val current = store.getTableInfo(name).version
        while (running && cursor < current) {
          val next = cursor + 1
          onChanges(store.getChanges(name, next - 1, next), next)
          cursor = next
        }
      } catch {
        // close() interrupts the thread AFTER clearing `running` — an
        // interrupt while still running is foreign (job-group cancel,
        // a third-party Thread.interrupt) and may have landed mid-
        // delivery with the cursor not yet advanced; swallowing it
        // would redeliver that version on the next poll, violating
        // at-most-once. Stop loudly instead.
        case ie: InterruptedException =>
          if (running) { running = false; onError(ie) }
        case e: Throwable if running =>
          running = false
          onError(e)
      }
      if (running)
        try Thread.sleep(pollMillis)
        catch { case _: InterruptedException => () }
    }
  }, s"graft-cdf-follower-$name")

  /** Stop polling; the in-flight delivery (if any) completes. */
  def close(): Unit = {
    running = false
    thread.interrupt()
    thread.join(30000)
  }
}

object ChangeFeedFollower {

  /** Start following `name`'s change feed from (exclusive)
    * `fromVersion`. The handler receives `(changes, version)` per new
    * commit; `fromVersion = 0` replays since creation (subject to
    * retention). Errors (including falling behind retention) stop the
    * follower and surface through `onError`.
    */
  def start(
      store: FeatureStore,
      name: String,
      fromVersion: Int,
      pollMillis: Long = 1000L,
      onError: Throwable => Unit = e => throw e)(
      onChanges: (DataFrame, Int) => Unit): ChangeFeedFollower = {
    require(fromVersion >= 0, s"fromVersion must be >= 0, got $fromVersion")
    require(pollMillis > 0, s"pollMillis must be positive, got $pollMillis")
    val f = new ChangeFeedFollower(
      store, name, fromVersion, pollMillis, onChanges, onError)
    f.thread.setDaemon(true)
    f.thread.start()
    f
  }
}
