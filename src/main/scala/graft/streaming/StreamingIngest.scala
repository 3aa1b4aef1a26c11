package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.FeatureStore

/** Structured Streaming ingest for the feature store — the extension the
  * reference explicitly lacks (reference README.md:108 "Streaming
  * features: No"; late data handled by "re-register", README.md:142).
  *
  * Design: `readStream → withWatermark → foreachBatch(register)`. Each
  * micro-batch becomes a new table version through the exact same
  * `register` path batch writes use, so the batch PIT read path —
  * [[graft.store.PointInTime]] — serves streaming features unchanged.
  * That preserves the reference's train/serve symmetry ("same logic,
  * same code path", README.md:96) while adding incremental arrival.
  *
  * At scale: per-batch full snapshots inherit the reference's
  * snapshot-versioning semantics; compaction/retention is `maxVersions`
  * pruning. The watermark bounds state and discards data later than
  * `lateness` (policy parity: accept staleness, recompute next batch).
  */
object StreamingIngest {

  /** Start ingesting a streaming frame (must carry entity_id/timestamp)
    * into `store` under `name`. Each non-empty micro-batch is appended to
    * the table's current state and registered as a new version, so the
    * feature log accumulates across batches (the reference's
    * "re-register the whole table" policy, automated). Full-snapshot
    * rewrite per batch mirrors the reference's versioning semantics; at
    * 100 TB the same seam takes a Delta/Iceberg append instead.
    *
    * Late rows are ACCEPTED, not dropped: a foreachBatch sink has no
    * stateful operator, so a watermark here would be a silent no-op —
    * and accepting late data IS the reference's policy ("accept
    * staleness and recompute in the next batch", README.md:142). Bounded
    * lateness filtering belongs to the stateful operators in
    * [[StreamingFeatures]].
    *
    * REPLAY-SAFE: registration goes through
    * [[FeatureStore.registerBatch]], keyed by (stream identity, batch
    * id). The stream identity is `StreamingQuery.id` — persisted in the
    * checkpoint, so it is STABLE across restarts from one checkpoint
    * and FRESH for a new checkpoint directory. After a crash recovery
    * Structured Streaming re-delivers the last batch with the same
    * (id, batchId); the store's persisted high-water mark detects it
    * and the replay mints no duplicate version (and, since the skip
    * happens before the accumulate-union is registered, no
    * double-appended rows). A restart with a FRESH checkpoint restarts
    * batch ids at 0 under a NEW query id — a new high-water line, so
    * every batch registers instead of being mistaken for a replay.
    */
  def start(
      stream: DataFrame,
      store: FeatureStore,
      name: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    withQueryId { queryId =>
      val body: (DataFrame, Long) => Unit =
        (batch, bid) => processBatch(store, name, queryId.join())(batch, bid)
      stream.writeStream
        .outputMode("append")
        .trigger(trigger)
        .foreachBatch(body)
        .start()
    }

  /** The O(delta) form of [[start]]: each micro-batch is
    * APPEND-registered ([[FeatureStore.registerAppendBatch]] — manifest
    * chaining, only the batch's own rows written), instead of
    * rewriting the accumulated table per batch. Reads are identical;
    * write cost per batch drops from O(table) to O(batch) — the only
    * streaming-register shape that survives an unbounded stream at
    * 100 TB. Same batch-id replay safety; `maxSegments` bounds read
    * amplification via auto-compaction exactly as in batch appends.
    */
  def startIncremental(
      stream: DataFrame,
      store: FeatureStore,
      name: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxSegments: Int = 16): StreamingQuery =
    withQueryId { queryId =>
      val body: (DataFrame, Long) => Unit =
        (batch, bid) =>
          processBatchIncremental(store, name, maxSegments, queryId.join())(batch, bid)
      stream.writeStream
        .outputMode("append")
        .trigger(trigger)
        .foreachBatch(body)
        .start()
    }

  /** The CDC-APPLY form: each micro-batch is MERGE-upserted
    * ([[FeatureStore.registerUpsertBatch]]) — rows replace current rows
    * with the same (entity_id, timestamp) key and insert otherwise.
    * This is the shape that materializes a change stream (a CDC feed,
    * a correction stream, an at-least-once producer emitting revised
    * observations) into the store: re-delivered keys CONVERGE instead
    * of accumulating duplicates, while batch-id idempotence still
    * makes whole-batch crash replays exactly-once. Write cost per
    * batch is O(affected segments + batch), same copy-on-write shape
    * as the batch upsert.
    */
  def startUpsert(
      stream: DataFrame,
      store: FeatureStore,
      name: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    withQueryId { queryId =>
      val body: (DataFrame, Long) => Unit =
        (batch, bid) => processBatchUpsert(store, name, queryId.join())(batch, bid)
      stream.writeStream
        .outputMode("append")
        .trigger(trigger)
        .foreachBatch(body)
        .start()
    }

  /** Expectation-gated streaming ingest — [[startIncremental]] with
    * [[FeatureStore.registerWithExpectations]]'s split applied per
    * micro-batch: rows failing any named predicate (false or NULL)
    * divert to `quarantine` with the comma-joined labels in a
    * `violated` column; clean rows append to `name`. Exactly-once on
    * BOTH tables: each side registers under the same (stream id, batch
    * id) high-water line, so a crash between the two commits replays
    * into a quarantine-side skip plus the missing main-side append —
    * quarantine lands FIRST, the same never-lose-bad-rows ordering as
    * the batch API.
    */
  def startWithExpectations(
      stream: DataFrame,
      store: FeatureStore,
      name: String,
      expectations: Seq[(String, org.apache.spark.sql.Column)],
      quarantine: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxSegments: Int = 16): StreamingQuery =
    withQueryId { queryId =>
      val body: (DataFrame, Long) => Unit =
        (batch, bid) => processBatchExpectations(
          store, name, expectations, quarantine, maxSegments,
          queryId.join())(batch, bid)
      stream.writeStream
        .outputMode("append")
        .trigger(trigger)
        .foreachBatch(body)
        .start()
    }

  /** foreachBatch body of [[startWithExpectations]]. */
  def processBatchExpectations(
      store: FeatureStore,
      name: String,
      expectations: Seq[(String, org.apache.spark.sql.Column)],
      quarantine: String,
      maxSegments: Int = 16,
      streamId: String = graft.store.CatalogIO.LegacyStreamId)(
      batch: DataFrame,
      batchId: Long): Unit =
    if (!batch.isEmpty) {
      import org.apache.spark.sql.functions.{coalesce, col, concat_ws, lit, not, when}
      val marker = "_graft_violated"
      val labeled = batch.withColumn(marker,
        concat_ws(",", expectations.map { case (label, pred) =>
          when(not(coalesce(pred, lit(false))), lit(label))
        }: _*)).persist()
      try {
        val bad = labeled.filter(col(marker) =!= "")
          .withColumnRenamed(marker, "violated")
        val good = labeled.filter(col(marker) === "").drop(marker)
        if (!bad.isEmpty) {
          store.registerAppendBatch(
            quarantine, bad, batchId, maxSegments, streamId + ":q")
          ()
        }
        if (!good.isEmpty) {
          store.registerAppendBatch(name, good, batchId, maxSegments, streamId)
          ()
        }
      } finally { labeled.unpersist(); () }
    }

  /** Capture the started query's checkpoint-stable id into the future
    * the foreachBatch closure blocks on: the id exists only after
    * `.start()` returns the [[StreamingQuery]], while the closure is
    * built before — and the first micro-batch (on the stream execution
    * thread) can race the main thread's `start()` return. The
    * completion happens-before any `join()` observes it; the batch
    * thread waits, never deadlocks (the completing thread never
    * blocks). On a FAILED start the future is completed exceptionally
    * so a half-launched batch thread cannot wait forever.
    */
  private def withQueryId(
      launch: java.util.concurrent.CompletableFuture[String] => StreamingQuery)
      : StreamingQuery = {
    val queryId = new java.util.concurrent.CompletableFuture[String]()
    try {
      val q = launch(queryId)
      queryId.complete(q.id.toString)
      q
    } catch {
      case e: Throwable => queryId.completeExceptionally(e); throw e
    }
  }

  /** The foreachBatch body, exposed so the replay contract is directly
    * testable: accumulate the batch onto the table's current state and
    * register idempotently under (streamId, batchId).
    */
  def processBatch(
      store: FeatureStore,
      name: String,
      streamId: String = graft.store.CatalogIO.LegacyStreamId)(
      batch: DataFrame,
      batchId: Long): Unit =
    if (!batch.isEmpty) {
      val accumulated =
        if (store.tableNames.contains(name))
          store
            .getVersion(name, store.getTableInfo(name).version)
            .unionByName(batch.select(
              batch.columns.map(org.apache.spark.sql.functions.col): _*))
        else batch
      store.registerBatch(name, accumulated, batchId, streamId)
      ()
    }

  /** foreachBatch body of [[startUpsert]]. */
  def processBatchUpsert(
      store: FeatureStore,
      name: String,
      streamId: String = graft.store.CatalogIO.LegacyStreamId)(
      batch: DataFrame,
      batchId: Long): Unit =
    if (!batch.isEmpty) {
      store.registerUpsertBatch(name, batch, batchId, streamId)
      ()
    }

  /** foreachBatch body of [[startIncremental]]. */
  def processBatchIncremental(
      store: FeatureStore,
      name: String,
      maxSegments: Int = 16,
      streamId: String = graft.store.CatalogIO.LegacyStreamId)(
      batch: DataFrame,
      batchId: Long): Unit =
    if (!batch.isEmpty) {
      store.registerAppendBatch(name, batch, batchId, maxSegments, streamId)
      ()
    }
}
