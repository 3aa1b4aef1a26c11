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
        sum(measure).as("sum_value"),
        // valued-row count: SQL sum over zero non-null rows is NULL,
        // not 0 — the fold needs this to keep an all-null group's
        // sum_value NULL exactly as the from-scratch rollup reports it
        count(measure).as("n_valued"))
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
    // the merge join must be NULL-SAFE (<=> per key): GROUP BY treats
    // NULL key values as one group, but a plain equi-join never matches
    // them — a nullable group key would silently fork divergent
    // state/delta rows. EqualNullSafe keys still hash-partition, so the
    // join stays a co-located shuffle join, never a nested loop.
    val dKeys = keyCols.map("_d_" + _)
    val delta = changes
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(sign).as("_dn"),
        sum(sign * measure).as("_dsum"),
        sum(sign * when(measure.isNotNull, 1L).otherwise(0L)).as("_dnv"))
      .toDF(dKeys ++ Seq("_dn", "_dsum", "_dnv"): _*)
    val nullSafeOn = keyCols.zip(dKeys)
      .map { case (k, d) => col(k) <=> col(d) }
      .reduce(_ && _)
    // sum_value is NULL exactly when no valued row remains (SQL sum
    // semantics) — a bare coalesce-to-0 fold would turn an all-null
    // group's NULL into 0 and diverge from the from-scratch rollup
    val newNv =
      coalesce(col("n_valued"), lit(0L)) + coalesce(col("_dnv"), lit(0L))
    state
      .join(delta, nullSafeOn, "outer")
      .select(
        keyCols.zip(dKeys).map { case (k, d) =>
          coalesce(col(k), col(d)).as(k)
        } ++ Seq(
          (coalesce(col("n_rows"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
            .as("n_rows"),
          when(newNv === 0L, lit(null))
            .otherwise(coalesce(col("sum_value"), lit(0L)) +
              coalesce(col("_dsum"), lit(0L)))
            .as("sum_value"),
          newNv.as("n_valued")): _*)
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

  // ----------------------------------------------- serving-table IVM

  /** From-scratch SERVING TABLE: one row per entity — its latest
    * observation by `(tsCol, tieCols...)`, which together with
    * `entityCol` must uniquely identify a row (events: `event_id`).
    * This is the online-store materialization of the reference's
    * `get(..., now)` semantics, in the maintainable form
    * [[applyChangesServing]] keeps current O(changes) per fold.
    */
  def initialStateServing(
      snapshot: DataFrame,
      tieCols: Seq[String],
      entityCol: String = "entity_id",
      tsCol: String = "timestamp"): DataFrame = {
    val cols = snapshot.columns.toSeq
    val key = struct((tsCol +: tieCols).map(col): _*)
    snapshot
      .groupBy(col(entityCol).as("_e"))
      .agg(max_by(struct(cols.map(col): _*), key).as("_row"))
      .select(col("_row.*"))
  }

  /** Fold change-feed rows into a serving table. The latest-row
    * aggregate is non-invertible like min/max, and the same boundary
    * argument gives the selective fold: an APPENDED row either
    * advances the entity's latest (strictly greater key) or is
    * shadowed; a DELETE strictly below the entity's current latest
    * key provably cannot change it. Only entities whose deletes reach
    * the current latest key (or entities born-and-shrunk inside the
    * interval) are dirty and rescanned EXACTLY from `current`. An
    * append-only serving feed — the production shape — never rescans.
    */
  def applyChangesServing(
      state: DataFrame,
      changes: DataFrame,
      current: DataFrame,
      tieCols: Seq[String],
      entityCol: String = "entity_id",
      tsCol: String = "timestamp"): DataFrame = {
    val cols = state.columns.toSeq
    val isIns = col(FS.ChangeTypeCol) === "insert"
    val key = struct((tsCol +: tieCols).map(col): _*)
    val delta = changes
      .groupBy(col(entityCol).as("_e"))
      .agg(
        max_by(when(isIns, struct(cols.map(col): _*)), when(isIns, key))
          .as("_ins_row"),
        max(when(isIns, key)).as("_ins_key"),
        max(when(!isIns, key)).as("_del_key"),
        sum(when(isIns, 0L).otherwise(1L)).as("_del_n"))
    val joined = state
      .withColumn("_s_present", lit(true))
      .join(delta, col(entityCol) <=> col("_e"), "outer")
    val stateKey = struct((tsCol +: tieCols).map(col): _*)
    val dirty = coalesce(col("_del_n"), lit(0L)) > 0L &&
      (col("_s_present").isNull || col("_del_key") >= stateKey)
    val advanced = col("_s_present").isNull ||
      (col("_ins_key").isNotNull && col("_ins_key") > stateKey)
    val merged = joined.select(
      coalesce(col(entityCol), col("_e")).as("_ent"),
      when(advanced, col("_ins_row"))
        .otherwise(struct(cols.map(col): _*)).as("_row"),
      dirty.as("_dirty"))
    val clean = merged
      .filter(!col("_dirty") && col("_row").isNotNull)
      .select(col("_row.*"))
    val dirtyEntities = merged.filter(col("_dirty")).select(col("_ent"))
    val rescanOn = current(entityCol) <=> dirtyEntities("_ent")
    val rescanned = initialStateServing(
      current.join(dirtyEntities, rescanOn, "left_semi"),
      tieCols, entityCol, tsCol)
    clean.unionByName(rescanned)
  }

  /** The maintained serving table of `table` at its current version —
    * equals the from-scratch latest-per-entity of the current content.
    *
    * FUSED maintenance plan: because the seed here is known to be the
    * argmax of the v1 snapshot (not an arbitrary pre-existing serving
    * table), the seed aggregation, the change-delta aggregation, and
    * their outer join collapse into ONE grouped pass over the tagged
    * union (v1 rows side 0, feed rows side 1) — the conditional
    * aggregates compute the state argmax, the best inserted row, and
    * the delete boundary per entity in a single shuffle, and the
    * per-entity merge becomes plain column arithmetic instead of a
    * join. Semantics are [[applyChangesServing]]'s exactly (same
    * advance and dirty conditions); that general fold remains the
    * entry point for callers holding a materialized state (the
    * streaming follower).
    *
    * Dirty entities (a delete reaching the state's latest key) resolve
    * from the CURRENT version's rows carried as side 2 of the SAME
    * grouped pass — per-entity argmax over side 2 is exactly the
    * rescan's answer, without the dirty-set semi-join + second
    * aggregate job chain the rescan formulation needs. Side 2 joins
    * the union only when the version history says deletes are possible
    * (any version > 1 whose operation isn't append/compact/optimize —
    * a metadata check, no job): an append-only feed — the production
    * shape — never reads the current version at all. That keeps the
    * O(changes) claim honest: the union's map-side partial argmax
    * collapses every side to one candidate per (entity, partition)
    * before the shuffle, and a delete-bearing history pays one extra
    * sequential scan of current — which the rescan plan also paid,
    * plus a join — never an extra shuffle of it.
    */
  def maintainedServing(
      store: FeatureStore,
      table: String,
      tieCols: Seq[String],
      entityCol: String = "entity_id",
      tsCol: String = "timestamp"): DataFrame = {
    val current = store.getTableInfo(table).version
    if (current <= 1)
      return initialStateServing(
        store.getVersion(table, 1), tieCols, entityCol, tsCol)
    val snapshot = store.getVersion(table, 1)
    val changes = store.getChanges(table, 1, current)
    val cols = snapshot.columns.toSeq
    val key = struct((tsCol +: tieCols).map(col): _*)
    val isIns = col(FS.ChangeTypeCol) === "insert"
    val base = snapshot.select(
      col(entityCol).as("_e"), lit(0).as("_side"), lit(true).as("_ins"),
      key.as("_k"), struct(cols.map(col): _*).as("_row"))
    val feed = changes.select(
      col(entityCol).as("_e"), lit(1).as("_side"), isIns.as("_ins"),
      key.as("_k"), struct(cols.map(col): _*).as("_row"))
    val deleteFree = Set("append") ++ FS.ContentPreservingOps
    val mayDelete = store.getTableHistory(table).exists(h =>
      h.version > 1 && !h.operation.exists(deleteFree.contains))
    val union =
      if (!mayDelete) base.unionByName(feed)
      else base.unionByName(feed).unionByName(
        store.getVersion(table, current).select(
          col(entityCol).as("_e"), lit(2).as("_side"), lit(true).as("_ins"),
          key.as("_k"), struct(cols.map(col): _*).as("_row")))
    val fromBase = col("_side") === 0
    val fromFeed = col("_side") === 1
    val fromCur = col("_side") === 2
    val merged = union
      .groupBy(col("_e"))
      .agg(
        max_by(when(fromBase, col("_row")), when(fromBase, col("_k")))
          .as("_state_row"),
        max(when(fromBase, col("_k"))).as("_state_key"),
        max_by(when(fromFeed && col("_ins"), col("_row")),
          when(fromFeed && col("_ins"), col("_k"))).as("_ins_row"),
        max(when(fromFeed && col("_ins"), col("_k"))).as("_ins_key"),
        max(when(fromFeed && !col("_ins"), col("_k"))).as("_del_key"),
        sum(when(fromFeed && !col("_ins"), 1L).otherwise(0L)).as("_del_n"),
        max_by(when(fromCur, col("_row")), when(fromCur, col("_k")))
          .as("_cur_row"))
    val sPresent = col("_state_key").isNotNull
    val dirty = col("_del_n") > 0L &&
      (!sPresent || col("_del_key") >= col("_state_key"))
    val advanced = !sPresent ||
      (col("_ins_key").isNotNull && col("_ins_key") > col("_state_key"))
    merged
      .select(
        when(dirty, col("_cur_row"))
          .otherwise(when(advanced, col("_ins_row"))
            .otherwise(col("_state_row"))).as("_row"))
      .filter(col("_row").isNotNull)
      .select(col("_row.*"))
  }

  // --------------------------------------------------- moment-IVM

  /** From-scratch SECOND-MOMENT state: per key `n_rows`, `sum_value`,
    * `sum_sq` — everything mean/variance/stddev derive from, kept as
    * exact integers so folds cancel exactly (the measure must be
    * integral cents-style; its square must fit a BIGINT, i.e.
    * |measure| < ~3M at a billion rows per group).
    */
  def initialStateStats(
      snapshot: DataFrame,
      keyCols: Seq[String],
      measure: Column): DataFrame = {
    require(keyCols.nonEmpty, "incremental rollup needs at least one key column")
    snapshot
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(measure).as("sum_value"),
        sum(measure * measure).as("sum_sq"),
        count(measure).as("n_valued")) // see initialState
  }

  /** Fold change-feed rows into a second-moment state — the same
    * signed additive fold as [[applyChanges]] with the squared sum
    * riding along (squares are sign-folded too: a delete subtracts its
    * square exactly). Null-safe merge, zero-row groups vanish.
    */
  def applyChangesStats(
      state: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      measure: Column): DataFrame = {
    val sign = when(col(FS.ChangeTypeCol) === "insert", 1L).otherwise(-1L)
    val dKeys = keyCols.map("_d_" + _)
    val delta = changes
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(sign).as("_dn"),
        sum(sign * measure).as("_dsum"),
        sum(sign * measure * measure).as("_dsq"),
        sum(sign * when(measure.isNotNull, 1L).otherwise(0L)).as("_dnv"))
      .toDF(dKeys ++ Seq("_dn", "_dsum", "_dsq", "_dnv"): _*)
    val nullSafeOn = keyCols.zip(dKeys)
      .map { case (k, d) => col(k) <=> col(d) }
      .reduce(_ && _)
    // NULL iff no valued row remains — see applyChanges
    val newNv =
      coalesce(col("n_valued"), lit(0L)) + coalesce(col("_dnv"), lit(0L))
    state
      .join(delta, nullSafeOn, "outer")
      .select(
        keyCols.zip(dKeys).map { case (k, d) =>
          coalesce(col(k), col(d)).as(k)
        } ++ Seq(
          (coalesce(col("n_rows"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
            .as("n_rows"),
          when(newNv === 0L, lit(null))
            .otherwise(coalesce(col("sum_value"), lit(0L)) +
              coalesce(col("_dsum"), lit(0L)))
            .as("sum_value"),
          when(newNv === 0L, lit(null))
            .otherwise(coalesce(col("sum_sq"), lit(0L)) +
              coalesce(col("_dsq"), lit(0L)))
            .as("sum_sq"),
          newNv.as("n_valued")): _*)
      .filter(col("n_rows") > 0L)
  }

  /** The maintained second-moment rollup of `table` at its current
    * version — equals the from-scratch [[initialStateStats]] of the
    * current content. Mean/variance derive downstream:
    * mean = sum/n, var = (sum_sq - sum²/n)/n — one or two IEEE double
    * divisions over exact integers, bit-portable.
    */
  def maintainedStats(
      store: FeatureStore,
      table: String,
      keyCols: Seq[String],
      measure: Column): DataFrame = {
    val current = store.getTableInfo(table).version
    val seed = initialStateStats(store.getVersion(table, 1), keyCols, measure)
    if (current <= 1) seed
    else applyChangesStats(
      seed, store.getChanges(table, 1, current), keyCols, measure)
  }

  // ---------------------------------------------- COUNT(DISTINCT) IVM

  private val DistinctValCol = "_graft_v"

  /** From-scratch COUNT(DISTINCT `value`) state: the maintainable form
    * is one level finer than the answer — (key, value, n_rows)
    * MULTIPLICITIES — because distinct-ness is not additive but
    * multiplicity is: an insert bumps its (key, value) row, a delete
    * decrements it, and a value leaves the distinct set exactly when
    * its multiplicity hits zero. The visible rollup is
    * [[distinctCounts]] over this state.
    */
  def initialStateDistinct(
      snapshot: DataFrame,
      keyCols: Seq[String],
      value: Column): DataFrame =
    initialState(snapshot.withColumn(DistinctValCol, value),
      keyCols :+ DistinctValCol, lit(0L))

  /** Fold change-feed rows into a distinct-multiplicity state — the
    * additive [[applyChanges]] fold with (key, value) as the composite
    * key (value groups ride the null-safe merge, so NULL values keep
    * exact multiplicities too; they are EXCLUDED from the distinct
    * count per SQL semantics). O(changes) per fold, state bounded by
    * Σ per-key distinct values.
    */
  def applyChangesDistinct(
      state: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      value: Column): DataFrame =
    applyChanges(state, changes.withColumn(DistinctValCol, value),
      keyCols :+ DistinctValCol, lit(0L))

  /** The visible rollup of a distinct-multiplicity state: per key,
    * total rows and the SQL-semantics distinct count (NULL values
    * counted in n_rows, never in n_distinct).
    */
  def distinctCounts(state: DataFrame, keyCols: Seq[String]): DataFrame =
    state
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum("n_rows").as("n_rows"),
        count(when(col(DistinctValCol).isNotNull, lit(1))).as("n_distinct"))

  /** The maintained COUNT(DISTINCT) rollup of `table` at its current
    * version — same contract as [[maintained]]: equals the
    * from-scratch `count(*)` / `count(DISTINCT value)` per key of the
    * current content.
    */
  def maintainedDistinct(
      store: FeatureStore,
      table: String,
      keyCols: Seq[String],
      value: Column): DataFrame = {
    val current = store.getTableInfo(table).version
    val seed = initialStateDistinct(store.getVersion(table, 1), keyCols, value)
    val state =
      if (current <= 1) seed
      else applyChangesDistinct(
        seed, store.getChanges(table, 1, current), keyCols, value)
    distinctCounts(state, keyCols)
  }

  // ------------------------------------------------- non-invertible IVM

  /** From-scratch MIN/MAX state of `snapshot`: one row per key with
    * `n_rows`, `min_value`, `max_value`. Unlike count/sum these
    * aggregates are NOT invertible — a delete can expose a new extreme
    * only a rescan can find — so the maintained fold
    * ([[applyChangesMinMax]]) is selective: it folds insert-only groups
    * closed-form and rescans ONLY the groups whose recorded deletes
    * touch a boundary.
    */
  def initialStateMinMax(
      snapshot: DataFrame,
      keyCols: Seq[String],
      measure: Column): DataFrame = {
    require(keyCols.nonEmpty, "incremental rollup needs at least one key column")
    snapshot
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        min(measure).as("min_value"),
        max(measure).as("max_value"))
  }

  /** Fold an interval of change-feed rows into a MIN/MAX state.
    *
    * The fold is closed-form wherever algebra allows: inserts only
    * widen bounds (`least`/`greatest`), and a delete STRICTLY inside
    * the state's (min, max) cannot move either extreme — the boundary
    * rows themselves are provably still present (deleting one would put
    * the delete AT the boundary). Only groups with a boundary-touching
    * delete (or deletes on a group born inside the interval, where no
    * prior bounds exist) are "dirty" and recomputed EXACTLY, from
    * `current` filtered to just those keys.
    *
    * Scale shape: the delta aggregation is O(changes) partial-
    * aggregated; the state merge is one null-safe key join bounded by
    * group cardinality; the rescan reads only dirty groups' rows (a
    * key semi-join the scan prunes on) — an append-heavy feed rescans
    * NOTHING, and a mutation-heavy feed pays per dirty group, never
    * O(table).
    */
  def applyChangesMinMax(
      state: DataFrame,
      changes: DataFrame,
      current: DataFrame,
      keyCols: Seq[String],
      measure: Column): DataFrame = {
    val isIns = col(FS.ChangeTypeCol) === "insert"
    val dKeys = keyCols.map("_d_" + _)
    val delta = changes
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(when(isIns, 1L).otherwise(-1L)).as("_dn"),
        sum(when(isIns, 0L).otherwise(1L)).as("_del_n"),
        min(when(isIns, measure)).as("_ins_min"),
        max(when(isIns, measure)).as("_ins_max"),
        min(when(!isIns, measure)).as("_del_min"),
        max(when(!isIns, measure)).as("_del_max"))
      .toDF(dKeys ++ Seq(
        "_dn", "_del_n", "_ins_min", "_ins_max", "_del_min", "_del_max"): _*)
    val nullSafeOn = keyCols.zip(dKeys)
      .map { case (k, d) => col(k) <=> col(d) }
      .reduce(_ && _)
    val outKeys = keyCols.zip(dKeys).map { case (k, d) =>
      coalesce(col(k), col(d)).as(k)
    }
    val newN =
      coalesce(col("n_rows"), lit(0L)) + coalesce(col("_dn"), lit(0L))
    // a deleted NULL measure never moves min/max; non-null deletes are
    // compared against the state bounds (absent state = no bounds =
    // dirty; all-null state bounds with a non-null delete cannot arise,
    // but route it to the exact rescan anyway)
    val dirty = coalesce(col("_del_n"), lit(0L)) > 0L &&
      (col("_del_min").isNotNull || col("_del_max").isNotNull) &&
      (col("n_rows").isNull || col("min_value").isNull ||
        col("_del_min") <= col("min_value") ||
        col("_del_max") >= col("max_value"))
    val merged = state.join(delta, nullSafeOn, "outer")
      .select(outKeys ++ Seq(
        newN.as("n_rows"),
        least(col("min_value"), col("_ins_min")).as("min_value"),
        greatest(col("max_value"), col("_ins_max")).as("max_value"),
        dirty.as("_dirty")): _*)
      .filter(col("n_rows") > 0L)
    val dirtyKeys = merged.filter(col("_dirty")).select(keyCols.map(col): _*)
    val clean = merged.filter(!col("_dirty")).drop("_dirty")
    // exact recompute of just the dirty groups, from current content;
    // null-group keys must survive the semi-join, hence <=> again
    val rescanOn = keyCols
      .map(k => current(k) <=> dirtyKeys(k))
      .reduce(_ && _)
    val rescanned = initialStateMinMax(
      current.join(dirtyKeys, rescanOn, "left_semi"), keyCols, measure)
    clean.unionByName(rescanned)
  }

  /** The maintained MIN/MAX rollup of `table` at its current version —
    * [[maintained]]'s non-invertible sibling, same contract: equals the
    * from-scratch [[initialStateMinMax]] of the current content.
    */
  def maintainedMinMax(
      store: FeatureStore,
      table: String,
      keyCols: Seq[String],
      measure: Column): DataFrame = {
    val current = store.getTableInfo(table).version
    val seed = initialStateMinMax(store.getVersion(table, 1), keyCols, measure)
    if (current <= 1) seed
    else applyChangesMinMax(
      seed, store.getChanges(table, 1, current),
      store.getVersion(table, current), keyCols, measure)
  }
}
