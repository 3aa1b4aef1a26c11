package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.store.{FeatureStore => FS}

/** Incremental view maintenance (IVM) for additive rollups over the
  * change feed — the Materialize/Delta-live-table pattern: a GROUP BY
  * aggregate kept current by folding each commit's RECORDED change set
  * into the prior state, never rescanning the table after the initial
  * snapshot. Because the maintained aggregates are additive (count,
  * sum), every feed row contributes a signed delta — `insert` adds,
  * `delete` subtracts, and an upsert's delete+insert pair nets the
  * value difference — so an arbitrary interval of commits folds in ONE
  * delta aggregation, and maintenance cost is O(changes in interval),
  * not O(table).
  *
  * Exactness discipline: the measure must be integral (cents-style
  * BIGINT) so delta sums are order-independent and cancel exactly;
  * groups whose maintained count reaches zero are dropped, leaving the
  * state literally equal to the from-scratch rollup (the oracle-gated
  * claim of `store_ivm_rollup`).
  *
  * Scale shape: the delta aggregation partial-aggregates the feed
  * (O(changes) through the shuffle); the merge is one state-keyed
  * outer join, bounded by GROUP cardinality, not table size. At 100 TB
  * with a compact group domain the state broadcasts; with a huge one
  * both sides hash-partition on the same key and the join is
  * co-located with the delta aggregation's own shuffle.
  */
object IncrementalRollup {

  /** The from-scratch rollup of `snapshot`: one row per distinct key
    * with `n_rows` and `sum_value` (the additive state). `measure`
    * must be an integral-typed column expression over the snapshot's
    * columns.
    */
  def initialState(
      snapshot: DataFrame,
      keyCols: Seq[String],
      measure: Column): DataFrame = {
    require(keyCols.nonEmpty, "incremental rollup needs at least one key column")
    snapshot
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(measure).as("sum_value"))
  }

  /** Fold an interval of change-feed rows (`_change_type` ∈
    * insert|delete, as produced by [[FeatureStore.getChanges]]) into a
    * prior state. Additivity makes the fold order-free: the whole
    * interval aggregates to one signed delta per key, merged with one
    * outer join. Groups netting to zero rows vanish from the state.
    */
  def applyChanges(
      state: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      measure: Column): DataFrame = {
    val sign = when(col(FS.ChangeTypeCol) === "insert", 1L).otherwise(-1L)
    val delta = changes
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(sign).as("_dn"),
        sum(sign * measure).as("_dsum"))
    state
      .join(delta, keyCols, "outer")
      .select(
        keyCols.map(col) ++ Seq(
          (coalesce(col("n_rows"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
            .as("n_rows"),
          (coalesce(col("sum_value"), lit(0L)) + coalesce(col("_dsum"), lit(0L)))
            .as("sum_value")): _*)
      .filter(col("n_rows") > 0L)
  }

  /** The maintained rollup of `table` at its current version: seed
    * from version 1's snapshot, then fold every later commit's change
    * set in one O(changes) pass. Equals the from-scratch rollup of the
    * current content — that equality is the IVM contract.
    */
  def maintained(
      store: FeatureStore,
      table: String,
      keyCols: Seq[String],
      measure: Column): DataFrame = {
    val current = store.getTableInfo(table).version
    val seed = initialState(store.getVersion(table, 1), keyCols, measure)
    if (current <= 1) seed
    else applyChanges(
      seed, store.getChanges(table, 1, current), keyCols, measure)
  }
}
