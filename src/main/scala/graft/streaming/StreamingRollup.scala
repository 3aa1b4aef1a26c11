package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.IncrementalRollup

/** A STREAMING materialized view: a rollup maintained as a Structured
  * Streaming query over a graft table's change feed — the continuous
  * half of [[graft.store.IncrementalRollup]] (whose batch fold is
  * oracle-gated by `store_ivm_rollup`). Each micro-batch of feed rows
  * (the initial snapshot as inserts, then every commit's recorded
  * change set) folds into the prior state — O(batch changes) per fold,
  * never a table rescan. All four IVM flavors stream: additive
  * sum/count ([[start]]), second-moment ([[startStats]]),
  * COUNT(DISTINCT) via multiplicity state ([[startDistinct]]), and
  * min/max with version-pinned dirty-group rescans ([[startMinMax]]).
  *
  * Exactly-once without a transactional sink: the state is versioned
  * by BATCH ID — batch `b` writes `state_v<b>` and then an explicit
  * completion marker (`_GRAFT_FOLDED`, the same discipline as
  * [[graft.sources]]' `_GRAFT_STAGED`). A replay of batch `b` is
  * skipped only when the MARKER exists; a bare directory is a crashed
  * partial write (the job died mid-parquet) and is re-folded with an
  * overwrite — a bare-existence check would both lose the fold and let
  * readers pick the corrupt directory as current. Readers and the
  * prior-state lookup honor only marker-carrying directories; older
  * state dirs (marked or partial) are pruned after each fold. This is
  * the standard idempotent-foreachBatch discipline, with the state
  * directory as the ledger.
  *
  * Scale shape: the state is GROUP-cardinality-bounded, so the
  * per-batch rewrite is O(state), not O(table); the fold's only
  * shuffles are the delta aggregation (partial-aggregated, O(batch))
  * and the state-keyed merge join.
  */
object StreamingRollup {

  private val StatePrefix = "state_v"
  private val Marker = "_GRAFT_FOLDED"

  /** The current maintained state under `stateDir` (max COMPLETED batch
    * version — marker-carrying; a partial crashed write is invisible),
    * or None before the first fold.
    */
  def currentState(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val dir = new Path(stateDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) None
    else {
      val vs = fs.listStatus(dir).toSeq
        .map(_.getPath)
        .filter(_.getName.startsWith(StatePrefix))
        .filter(p => fs.exists(new Path(p, Marker)))
        .map(_.getName.drop(StatePrefix.length).toLong)
      if (vs.isEmpty) None
      else Some(spark.read.parquet(s"$stateDir/$StatePrefix${vs.max}"))
    }
  }

  /** Start maintaining the rollup of `table` (at `root`) under
    * `stateDir`. `measure` must be an integral column expression over
    * the table's columns (cents-style, per the IVM exactness
    * discipline). Restarting from the same checkpoint resumes the
    * fold exactly where it stopped; replayed batches are no-ops.
    */
  def start(
      spark: SparkSession,
      root: String,
      table: String,
      keyCols: Seq[String],
      measure: Column,
      stateDir: String,
      checkpointLocation: String,
      maxVersionsPerBatch: Option[Int] = None,
      // zero-interval = catch-up-and-spin; a production follower on a
      // quiet table should pass a real interval (each empty trigger
      // polls the catalog)
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    maintain(spark, root, table, stateDir, checkpointLocation,
      maxVersionsPerBatch, trigger,
      seed = b => IncrementalRollup.initialState(b, keyCols, measure),
      fold = (prior, batch) =>
        IncrementalRollup.applyChanges(prior, batch, keyCols, measure))

  /** [[start]] for the SECOND-MOMENT state (n, sum, sum_sq) — same
    * additive exactly-once fold, mean/variance derive at read time.
    */
  def startStats(
      spark: SparkSession,
      root: String,
      table: String,
      keyCols: Seq[String],
      measure: Column,
      stateDir: String,
      checkpointLocation: String,
      maxVersionsPerBatch: Option[Int] = None,
      // zero-interval = catch-up-and-spin; a production follower on a
      // quiet table should pass a real interval (each empty trigger
      // polls the catalog)
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    maintain(spark, root, table, stateDir, checkpointLocation,
      maxVersionsPerBatch, trigger,
      seed = b => IncrementalRollup.initialStateStats(b, keyCols, measure),
      fold = (prior, batch) =>
        IncrementalRollup.applyChangesStats(prior, batch, keyCols, measure))

  /** [[start]] for the COUNT(DISTINCT) multiplicity state; read the
    * visible rollup with [[IncrementalRollup.distinctCounts]] over
    * [[currentState]].
    */
  def startDistinct(
      spark: SparkSession,
      root: String,
      table: String,
      keyCols: Seq[String],
      value: Column,
      stateDir: String,
      checkpointLocation: String,
      maxVersionsPerBatch: Option[Int] = None,
      // zero-interval = catch-up-and-spin; a production follower on a
      // quiet table should pass a real interval (each empty trigger
      // polls the catalog)
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    maintain(spark, root, table, stateDir, checkpointLocation,
      maxVersionsPerBatch, trigger,
      seed = b => IncrementalRollup.initialStateDistinct(b, keyCols, value),
      fold = (prior, batch) =>
        IncrementalRollup.applyChangesDistinct(prior, batch, keyCols, value))

  /** [[start]] for the NON-INVERTIBLE min/max state: each batch's
    * dirty-group rescan reads the table AS OF the batch's own last
    * commit (`_commit_version` rides every feed row), so a replayed or
    * lagging fold rescans the exact snapshot its changes end at —
    * never a newer one that would leak future values into the state.
    * A follower lagging past version retention fails loudly on the
    * time-travel read (the [[ChangeFeedFollower]] policy).
    */
  def startMinMax(
      spark: SparkSession,
      root: String,
      table: String,
      keyCols: Seq[String],
      measure: Column,
      stateDir: String,
      checkpointLocation: String,
      maxVersionsPerBatch: Option[Int] = None,
      // zero-interval = catch-up-and-spin; a production follower on a
      // quiet table should pass a real interval (each empty trigger
      // polls the catalog)
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    maintain(spark, root, table, stateDir, checkpointLocation,
      maxVersionsPerBatch, trigger,
      seed = b => IncrementalRollup.initialStateMinMax(b, keyCols, measure),
      fold = (prior, batch) => {
        val s = batch.sparkSession
        // an empty micro-batch (a commit whose change set cancels out)
        // has no _commit_version to pin — the state is unchanged, so
        // carry the prior forward rather than NPE on the null max
        val verRow = batch
          .agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions
              .col(graft.store.FeatureStore.CommitVersionCol)))
          .head()
        if (verRow.isNullAt(0)) prior
        else {
          val current = new graft.store.FeatureStore(s, root)
            .getVersion(table, verRow.getInt(0))
          IncrementalRollup.applyChangesMinMax(
            prior, batch, current, keyCols, measure)
        }
      })

  /** [[start]] for the SERVING TABLE (each entity's single latest row,
    * by ts + `tieCols`): the ONLINE STORE maintained live — appends
    * advance closed-form, and an entity whose delete reaches its
    * current latest key rescans from the table AS OF the batch's own
    * last commit (version-pinned like [[startMinMax]]). An append-only
    * feed — the production serving shape — never rescans.
    */
  def startServing(
      spark: SparkSession,
      root: String,
      table: String,
      tieCols: Seq[String],
      stateDir: String,
      checkpointLocation: String,
      entityCol: String = "entity_id",
      tsCol: String = "timestamp",
      maxVersionsPerBatch: Option[Int] = None,
      // zero-interval = catch-up-and-spin; a production follower on a
      // quiet table should pass a real interval (each empty trigger
      // polls the catalog)
      trigger: Trigger = Trigger.ProcessingTime(0)): StreamingQuery =
    maintain(spark, root, table, stateDir, checkpointLocation,
      maxVersionsPerBatch, trigger,
      seed = b => IncrementalRollup.initialStateServing(
        b.drop(graft.store.FeatureStore.ChangeTypeCol,
          graft.store.FeatureStore.CommitVersionCol),
        tieCols, entityCol, tsCol),
      fold = (prior, batch) => {
        val s = batch.sparkSession
        // empty micro-batch: no version to pin, state unchanged (see
        // startMinMax) — carry the prior forward
        val verRow = batch
          .agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions
              .col(graft.store.FeatureStore.CommitVersionCol)))
          .head()
        if (verRow.isNullAt(0)) prior
        else {
          val current = new graft.store.FeatureStore(s, root)
            .getVersion(table, verRow.getInt(0))
          IncrementalRollup.applyChangesServing(
            prior, batch, current, tieCols, entityCol, tsCol)
        }
      })

  /** The shared exactly-once fold harness: batch-id-versioned state
    * dirs, explicit completion marker, prune-after-write. `seed` builds
    * the empty initial state from the (emptied) first batch; `fold`
    * folds one batch of change rows into the prior state.
    */
  private def maintain(
      spark: SparkSession,
      root: String,
      table: String,
      stateDir: String,
      checkpointLocation: String,
      maxVersionsPerBatch: Option[Int],
      trigger: Trigger,
      seed: DataFrame => DataFrame,
      fold: (DataFrame, DataFrame) => DataFrame): StreamingQuery = {
    val reader = spark.readStream.format("graft")
      .option("root", root).option("table", table)
    maxVersionsPerBatch.foreach(m =>
      reader.option("maxVersionsPerBatch", m.toString))
    reader.load()
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val target = new Path(s"$stateDir/$StatePrefix$batchId")
        val fs = target.getFileSystem(s.sessionState.newHadoopConf())
        // replay guard on the explicit marker, never bare existence: a
        // marker-less dir is a crashed partial write — overwrite it
        if (!fs.exists(new Path(target, Marker))) {
          val prior = currentState(s, stateDir)
            .getOrElse(seed(batch.limit(0)))
          fold(prior, batch)
            .write.mode("overwrite").parquet(target.toString)
          fs.create(new Path(target, Marker), true).close()
          // prune all but the new state AND its predecessor: a reader
          // that resolved currentState() to the previous version must
          // not have the files deleted out from under its lazy plan
          // mid-read — one completed generation is the grace window
          val keep = fs.listStatus(new Path(stateDir)).toSeq
            .map(_.getPath)
            .filter(p => p.getName.startsWith(StatePrefix) &&
              p.getName.drop(StatePrefix.length).toLong < batchId &&
              fs.exists(new Path(p, Marker)))
            .map(_.getName.drop(StatePrefix.length).toLong)
            .sorted.lastOption
          fs.listStatus(new Path(stateDir)).toSeq
            .map(_.getPath)
            .filter { p =>
              val n = p.getName
              n.startsWith(StatePrefix) && {
                val v = n.drop(StatePrefix.length).toLong
                v < batchId && !keep.contains(v)
              }
            }
            .foreach(p => fs.delete(p, true))
        }
        ()
      }
      .option("checkpointLocation", checkpointLocation)
      .trigger(trigger)
      .start()
  }
}
