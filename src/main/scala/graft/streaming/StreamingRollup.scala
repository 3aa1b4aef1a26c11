package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.IncrementalRollup

/** A STREAMING materialized view: an additive rollup maintained as a
  * Structured Streaming query over a graft table's change feed — the
  * continuous half of [[graft.store.IncrementalRollup]] (whose batch
  * fold is oracle-gated by `store_ivm_rollup`). Each micro-batch of
  * feed rows (the initial snapshot as inserts, then every commit's
  * recorded change set) folds into the prior state via
  * `applyChanges` — O(batch changes) per fold, never a table rescan.
  *
  * Exactly-once without a transactional sink: the state is versioned
  * by BATCH ID — batch `b` writes `state_v<b>` (skipped if it already
  * exists, so a post-crash replay of the same batch cannot
  * double-fold) and older state dirs are pruned after the write.
  * Readers take the max version present; a crash between write and
  * prune leaves both, which the next batch or reader resolves. This is
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

  /** The current maintained state under `stateDir` (max batch version
    * present), or None before the first fold.
    */
  def currentState(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val dir = new Path(stateDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) None
    else {
      val vs = fs.listStatus(dir).toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith(StatePrefix))
        .map(_.drop(StatePrefix.length).toLong)
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
      maxVersionsPerBatch: Option[Int] = None): StreamingQuery = {
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
        if (!fs.exists(target)) { // replayed batch: already folded
          val prior = currentState(s, stateDir).getOrElse(
            IncrementalRollup.initialState(
              batch.limit(0), keyCols, measure))
          IncrementalRollup
            .applyChanges(prior, batch, keyCols, measure)
            .write.parquet(target.toString)
          fs.listStatus(new Path(stateDir)).toSeq
            .map(_.getPath)
            .filter(p => p.getName.startsWith(StatePrefix) &&
              p.getName.drop(StatePrefix.length).toLong < batchId)
            .foreach(p => fs.delete(p, true))
        }
        ()
      }
      .option("checkpointLocation", checkpointLocation)
      .trigger(Trigger.ProcessingTime(0))
      .start()
  }
}
