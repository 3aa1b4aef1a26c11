package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming feature computation on Structured Streaming — the windowed
  * and stateful halves of the streaming story ([[StreamingIngest]] being
  * the store-materialization half).
  *
  * Scale notes: both operators shuffle once by entity. Windowed-agg
  * state is bounded by the watermark (closed windows age out); the
  * latest-state map holds one entry per entity ever seen — the same
  * cardinality an online store would, bounded only if the entity domain
  * is. State lives in the state store, checkpointed, per-partition —
  * no driver involvement.
  */
object StreamingFeatures {

  /** One event row of the canonical streaming-feature shape. */
  final case class FeatureEvent(
      entity_id: String,
      timestamp: Timestamp,
      value: Double)

  /** The latest known state per entity, continuously maintained. */
  final case class LatestState(
      entity_id: String,
      timestamp: Timestamp,
      value: Double)

  /** Sliding-window aggregate features per entity with a watermark:
    * event counts and value sums per (entity, window). Late rows beyond
    * `lateness` are dropped by policy — the reference's "accept
    * staleness, recompute next batch" stance (README.md:142), but
    * incremental.
    */
  def windowedAggregates(
      stream: DataFrame,
      windowDuration: String,
      slideDuration: String,
      lateness: String = "10 minutes",
      entityCol: String = "entity_id",
      tsCol: String = "timestamp",
      valueCol: String = "value"): DataFrame =
    stream
      .withWatermark(tsCol, lateness)
      .groupBy(
        col(entityCol),
        window(col(tsCol), windowDuration, slideDuration))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"),
        max(col(tsCol)).as("last_event_ts"))
      .select(
        col(entityCol),
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_events"),
        col("sum_value"),
        col("last_event_ts"))

  /** Gap-based session windows per entity — the streaming twin of
    * [[graft.store.WindowFeatures.sessionize]], on Spark's native
    * `session_window` (merging-window state, watermark-expired).
    *
    * Boundary convention differs from the batch operator by design of
    * the built-in: `session_window` starts a NEW session when the gap
    * is >= `gapDuration` (window end = last event + gap), while the
    * batch operator keeps a gap exactly equal to the threshold in the
    * SAME session (strictly-greater split). Equal-to-gap spacings are
    * the only rows that disagree.
    *
    * Works identically over a batch DataFrame (same function, no
    * watermark needed) — the train/serve symmetry argument for using
    * the built-in rather than porting the batch lag/cumsum plan to
    * streaming state by hand.
    */
  def sessionWindows(
      stream: DataFrame,
      gapDuration: String,
      lateness: String = "10 minutes",
      entityCol: String = "entity_id",
      tsCol: String = "timestamp"): DataFrame = {
    val withWm =
      if (stream.isStreaming) stream.withWatermark(tsCol, lateness) else stream
    withWm
      .groupBy(col(entityCol), session_window(col(tsCol), gapDuration))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("first_event_ts"),
        max(col(tsCol)).as("last_event_ts"))
      .select(
        col(entityCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"),
        col("first_event_ts"),
        col("last_event_ts"))
  }

  /** Online-serving enrichment: attach each entity's LATEST feature row
    * (from a batch snapshot) to every arriving stream row — the
    * stream-side twin of [[graft.store.PointInTime.latestPerEntity]]
    * and the "low-latency feature lookup" half of a feature store,
    * expressed as a stream-static join so the same code path serves
    * batch frames too.
    *
    * The snapshot's timestamp column is renamed `feature_<tsCol>` (and
    * any other snapshot column colliding with a stream column gets the
    * `feature_` prefix) so event time and feature time stay separate.
    * Stream rows with no snapshot entry pass through null-extended
    * (left join) — serving must not drop traffic.
    *
    * Scale: the snapshot is one row per entity; `broadcast` keeps the
    * per-batch join shuffle-free while it fits (typical online stores),
    * `broadcastSnapshot = false` falls back to a partitioned join for
    * very large entity domains.
    */
  def enrichWithLatest(
      stream: DataFrame,
      featureSnapshot: DataFrame,
      entityCol: String = "entity_id",
      tsCol: String = "timestamp",
      broadcastSnapshot: Boolean = true): DataFrame = {
    val latest =
      graft.store.PointInTime.latestPerEntity(featureSnapshot, entityCol, tsCol)
    val streamCols = stream.columns.toSet
    val renamed = latest.columns.foldLeft(latest) { (df, c) =>
      if (c != entityCol && streamCols.contains(c))
        df.withColumnRenamed(c, s"feature_$c")
      else df
    }
    val right = if (broadcastSnapshot) broadcast(renamed) else renamed
    stream.join(right, Seq(entityCol), "left")
  }

  /** Streaming exact deduplication — the continuous-ingest twin of
    * [[graft.ops.Dedup.exactDuplicates]]: fingerprint the normalized
    * text (md5-derived, same hash as the batch path) and keep only the
    * FIRST arrival of each fingerprint, across micro-batches, via
    * Spark's built-in streaming `dropDuplicates` state.
    *
    * State is one entry per distinct fingerprint — exact forever-dedup
    * for a bounded corpus. For unbounded streams pass `withinWatermark`
    * to switch to `dropDuplicatesWithinWatermark`, which guarantees
    * suppression only for duplicates arriving within the watermark delay
    * and lets the state store evict older fingerprints (bounded state —
    * the exactness/recall trade every streaming dedup makes).
    *
    * Scale shape: one shuffle by fingerprint; state is partitioned in
    * the state store with no driver involvement, so the dedup set can
    * exceed any single executor's memory.
    */
  def dedupStream(
      stream: DataFrame,
      textCol: String = "text",
      tsCol: String = "timestamp",
      withinWatermark: Option[String] = None): DataFrame = {
    val withFp = stream.withColumn(
      "fingerprint",
      graft.functions.Hashing.md5Long60(lower(trim(col(textCol)))))
    withinWatermark match {
      case Some(lateness) =>
        withFp
          .withWatermark(tsCol, lateness)
          .dropDuplicatesWithinWatermark("fingerprint")
      case None =>
        withFp.dropDuplicates("fingerprint")
    }
  }

  /** Streaming incremental near-dup — the in-flight "does today's crawl
    * duplicate the corpus?" check: each micro-batch of incoming
    * documents is verified against a PREBUILT corpus index
    * ([[graft.ops.Dedup.buildNearDupIndex]], persisted/cached once) via
    * `foreachBatch` reusing the EXACT batch kernel
    * ([[graft.ops.Dedup.incrementalNearDupPairs]]) — batch/stream
    * symmetry by construction, the same stance as [[StreamingIngest]].
    * Per batch the handler receives the (new_id, corpus_id, jaccard)
    * pairs at or above `threshold`.
    *
    * Scale shape per micro-batch: the batch (small) is shingled and
    * hashed fresh; the corpus index is only probed at matching bands —
    * work is O(batch), never O(corpus).
    */
  def incrementalDedupStream(
      stream: DataFrame,
      index: graft.ops.Dedup.NearDupIndex,
      threshold: Double,
      numPerms: Int = 16,
      rowsPerBand: Int = 4,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text")(
      onBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(
          graft.ops.Dedup.incrementalNearDupPairs(
            batch, index, threshold, numPerms, rowsPerBand, n, idCol, textCol),
          batchId)
      }
      .start()

  /** Streaming embedding near-dup against a static pre-built IVF index
    * — the vector twin of [[incrementalDedupStream]], same foreachBatch
    * stance (batch/stream symmetry: the batch kernel IS the streaming
    * kernel). Per micro-batch the handler receives
    * (new_id, corpus_id, cosine) candidate pairs at or above
    * `threshold`, produced by
    * [[graft.ops.Similarity.incrementalCosineNearDupPairs]]: probe-list
    * pruning against the index, exact rescoring, O(batch) work — the
    * indexed corpus is never rescanned.
    */
  def embeddingDedupStream(
      stream: DataFrame,
      index: DataFrame,
      centroids: Array[Array[Double]],
      threshold: Double,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding")(
      onBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(
          graft.ops.Similarity.incrementalCosineNearDupPairs(
            batch, index, centroids, threshold, nProbe, idCol, vecCol),
          batchId)
      }
      .start()

  /** Continuously-maintained latest-row-per-entity — the streaming twin
    * of [[graft.store.PointInTime.latestPerEntity]] and the online-
    * serving materialization: each micro-batch emits only entities whose
    * latest state changed.
    *
    * Semantics: rows later than the watermark by more than `lateness`
    * are dropped before reaching the state function (EventTimeTimeout
    * enables Spark's late-event filter; with NoTimeout the watermark
    * would be a silent no-op here). Among surviving rows, the
    * max-(timestamp, value) row wins within a batch (deterministic
    * tie-break) and an equal-or-newer timestamp across batches replaces
    * held state. State is one entry per entity ever seen and is NOT
    * expired by the watermark — for unbounded entity domains (session
    * ids), add a state timeout at the call site.
    */
  def latestState(
      events: Dataset[FeatureEvent],
      lateness: String = "10 minutes"): Dataset[LatestState] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("timestamp", lateness)
      .groupByKey(_.entity_id)
      .flatMapGroupsWithState[LatestState, LatestState](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (entity: String, rows: Iterator[FeatureEvent], state: GroupState[LatestState]) =>
          val incoming = rows.maxByOption(e => (e.timestamp.getTime, e.value))
          val current = state.getOption
          // cross-batch acceptance uses the SAME (timestamp, value)
          // order as the in-batch winner: a ts-only >= would let an
          // equal-timestamp lower value arriving in a later batch
          // replace the held row, making the served state depend on
          // micro-batch boundaries
          incoming match {
            case Some(e)
                if current.forall(c =>
                  Ordering[(Long, Double)].gteq(
                    (e.timestamp.getTime, e.value),
                    (c.timestamp.getTime, c.value))) =>
              val next = LatestState(entity, e.timestamp, e.value)
              state.update(next)
              Iterator.single(next)
            case _ => Iterator.empty
          }
      }
  }
}
