package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming feature computation on Structured Streaming — the windowed
  * and stateful halves of the streaming story ([[StreamingIngest]] being
  * the store-materialization half).
  *
  * Scale notes: both operators shuffle once by entity; state is bounded
  * by the watermark (windowed aggs age out automatically, the
  * latest-state map holds one row per live entity — the same cardinality
  * an online store would). State lives in the state store, checkpointed,
  * per-partition — no driver involvement.
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

  /** Continuously-maintained latest-row-per-entity — the streaming twin
    * of [[graft.store.PointInTime.latestPerEntity]] and the online-
    * serving materialization: each micro-batch emits only entities whose
    * latest state changed. Out-of-order rows older than the held state
    * are ignored (PIT semantics: the max-timestamp row wins, ties to
    * the later arrival).
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
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (entity: String, rows: Iterator[FeatureEvent], state: GroupState[LatestState]) =>
          val incoming = rows.maxByOption(e => e.timestamp.getTime)
          val current = state.getOption
          incoming match {
            case Some(e)
                if current.forall(c => e.timestamp.getTime >= c.timestamp.getTime) =>
              val next = LatestState(entity, e.timestamp, e.value)
              state.update(next)
              Iterator.single(next)
            case _ => Iterator.empty
          }
      }
  }
}
