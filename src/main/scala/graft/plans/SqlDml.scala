package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, ExprId, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.StructType

import graft.sources.GraftCatalogTable
import graft.store.{FeatureStore, FeatureValidationError}

/** SQL `UPDATE` / `MERGE INTO` on graft catalog tables, the
  * session-extension route (the same shape Delta used for years): a
  * resolution rule swaps the resolved logical command for a runnable
  * command that executes through the store's own PROVEN mutation
  * operators — `UPDATE` and `MERGE ... WHEN MATCHED UPDATE / DELETE,
  * WHEN NOT MATCHED INSERT, WHEN NOT MATCHED BY SOURCE ...` all land
  * as ONE commit: a key-addressed MERGE rewrite (copy-on-write,
  * O(affected segments + delta)) that replaces touched keys and drops
  * vanished ones atomically ([[FeatureStore.registerRewrite]]).
  * Requires `spark.sql.extensions=graft.GraftExtensions` (analyzer
  * rules cannot attach to an already-built session).
  *
  * The store's primitives address WHOLE `(entity_id, timestamp)` keys
  * while SQL DML addresses ROWS, and duplicate-key observations are
  * legal — so both commands carry every untouched row of a touched key
  * ("duplicate-key siblings") through the delta unchanged, and MERGE's
  * cardinality guard fails only the SQL-standard ambiguity (one target
  * ROW matched by several source rows), never sibling rows matched
  * independently.
  *
  * `DELETE FROM` needs none of this: it resolves through
  * [[graft.sources.GraftCatalogTable]]'s `SupportsDeleteV2` with no
  * extension installed.
  */
object GraftDmlRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u: UpdateTable if u.resolved =>
      graftTarget(u.table) match {
        case Some((rel, t)) =>
          rejectSubqueries(u.condition.toSeq ++ u.assignments.map(_.value), "UPDATE")
          GraftUpdateCommand(
            t.root, t.table, rel.output, relationSchema(rel),
            u.assignments, u.condition)
        case None => u
      }
    case m: MergeIntoTable if m.resolved =>
      graftTarget(m.targetTable) match {
        case Some((rel, t)) =>
          if (m.withSchemaEvolution)
            throw new FeatureValidationError(
              "MERGE WITH SCHEMA EVOLUTION is not supported on graft tables; " +
                "evolve through a mergeSchema append/upsert first")
          val exprs = m.mergeCondition +:
            (m.matchedActions ++ m.notMatchedActions ++ m.notMatchedBySourceActions)
              .flatMap(actionExprs)
          rejectSubqueries(exprs, "MERGE INTO")
          GraftMergeCommand(
            t.root, t.table, rel.output, relationSchema(rel),
            m.sourceTable, m.mergeCondition,
            m.matchedActions, m.notMatchedActions, m.notMatchedBySourceActions)
        case None => m
      }
    case _ => plan
  }

  /** The (relation, graft table) under alias wrappers, if the DML
    * target is a graft catalog table.
    */
  private def graftTarget(
      plan: LogicalPlan): Option[(DataSourceV2Relation, GraftCatalogTable)] =
    EliminateSubqueryAliases(plan) match {
      case r: DataSourceV2Relation =>
        r.table match {
          case t: GraftCatalogTable if t.pinnedVersion.isDefined =>
            t.readOnly("UPDATE/MERGE INTO")
          case t: GraftCatalogTable => Some((r, t))
          case _ => None
        }
      case _ => None
    }

  /** The relation's column types, in output order (the relation's
    * attributes are the authority — the snapshot read must be
    * reshaped to exactly these).
    */
  private def relationSchema(rel: DataSourceV2Relation): StructType =
    StructType(rel.output.map(a =>
      org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable)))

  private def actionExprs(a: MergeAction): Seq[Expression] = a match {
    case UpdateAction(c, as, _) => c.toSeq ++ as.map(_.value)
    case DeleteAction(c) => c.toSeq
    case InsertAction(c, as) => c.toSeq ++ as.map(_.value)
    case other => other.condition.toSeq
  }

  private def rejectSubqueries(exprs: Seq[Expression], stmt: String): Unit =
    if (exprs.exists(_.exists(_.isInstanceOf[SubqueryExpression])))
      throw new FeatureValidationError(
        s"$stmt on graft tables does not support subqueries in " +
          "conditions or assignment values; materialize the subquery " +
          "into the source side")
}

/** Shared machinery: expression remapping onto renamed frames and
  * assignment application.
  */
private[plans] object GraftDml {

  /** Rewrite attribute references to the RENAMED columns of the
    * execution frames, as an unresolved-by-name Column the target
    * frame re-resolves — resolved function/cast nodes above the
    * leaves survive untouched.
    */
  def remap(e: Expression, names: Map[ExprId, String]): Column =
    bridge.column(e.transform {
      case a: AttributeReference =>
        UnresolvedAttribute.quoted(names.getOrElse(a.exprId,
          throw new FeatureValidationError(
            s"DML expression references an unknown column: ${a.name}")))
    })

  /** The plain target column an assignment writes (nested-field
    * assignment has no meaning on a feature row).
    */
  def assignedField(a: Assignment, targetNames: Map[ExprId, String]): String =
    a.key match {
      case ar: AttributeReference if targetNames.contains(ar.exprId) =>
        targetNames(ar.exprId)
      case other =>
        throw new FeatureValidationError(
          s"graft DML can only assign whole top-level columns, got: $other")
    }

  /** One output row-shape in the TABLE schema: assigned columns from
    * their remapped values, the rest from `fallback` (the matched
    * target row's column, or a typed null for inserts).
    */
  def projectRow(
      schema: StructType,
      assignments: Map[String, Column],
      fallback: String => Column): Seq[Column] =
    schema.fields.toSeq.map { f =>
      assignments.get(f.name)
        .map(_.cast(f.dataType))
        .getOrElse(fallback(f.name))
        .as(f.name)
    }

  /** NULL-SAFE left-semi join on the key columns: a sibling at a key
    * with a NULL component (null keys are legal observations) must
    * ride the delta exactly like any other touched key — ONE shared
    * definition with the store's key-addressed mutations
    * ([[graft.store.KeyJoins]]).
    */
  def semiJoinKeys(
      rows: DataFrame, keys: DataFrame, keyCols: Seq[String]): DataFrame =
    graft.store.KeyJoins.onKeys(rows, keys, keyCols, "left_semi")
}

/** `UPDATE <graft table> SET ... [WHERE ...]`: matched rows re-written
  * through the key-addressed MERGE upsert, as ONE commit. Because the
  * store allows duplicate `(entity_id, timestamp)` observations while
  * the upsert replaces ALL current rows of a touched key, every
  * UNMATCHED row of a touched key (a duplicate-key sibling the WHERE
  * skipped, or a pre-existing row at a key the update rekeys ONTO)
  * rides along in the delta unchanged — row-level SQL semantics over
  * the key-addressed primitive. An update that REKEYS rows (assigns
  * entity_id / timestamp) additionally drops the originals, in the
  * SAME commit via [[FeatureStore.registerRewrite]].
  */
case class GraftUpdateCommand(
    root: String,
    table: String,
    relOutput: Seq[Attribute],
    tableSchema: StructType,
    assignments: Seq[Assignment],
    condition: Option[Expression]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val store = new FeatureStore(spark, root)
    val names = relOutput.map(a => a.exprId -> a.name).toMap
    val assignedBy = assignments
      .map(a => GraftDml.assignedField(a, names) -> GraftDml.remap(a.value, names))
      .toMap
    val snapshot = store
      .getVersion(table, store.getTableInfo(table).version)
      .select(tableSchema.fieldNames.toSeq.map(col): _*)
    val condCol = condition.map(c => GraftDml.remap(c, names))
    val matched = condCol.map(snapshot.filter).getOrElse(snapshot).persist()
    try {
      if (!matched.isEmpty) {
        val keyCols = graft.store.Validation.RequiredColumns
        val keys = keyCols.map(col)
        val rekeying = keyCols.exists(assignedBy.contains)
        val updated = matched.select(
          GraftDml.projectRow(tableSchema, assignedBy, col): _*)
        // duplicate-key siblings: rows the WHERE did NOT match, at keys
        // the rewrite touches (matched keys, plus rekey targets), must
        // ride along unchanged — the key-addressed upsert replaces ALL
        // rows of a key, and a rekeying drop removes all rows of the
        // original keys
        val touchedKeys = (if (rekeying)
            matched.select(keys: _*).unionByName(updated.select(keys: _*))
          else matched.select(keys: _*)).distinct()
        val siblings = GraftDml.semiJoinKeys(
          condCol
            .map(c => snapshot.filter(!coalesce(c, lit(false))))
            .getOrElse(snapshot.limit(0)),
          touchedKeys, keyCols)
        val delta = updated.unionByName(siblings)
        if (rekeying)
          store.registerRewrite(table, delta, matched.select(keys: _*))
        else store.registerUpsert(table, delta)
        ()
      }
    } finally { matched.unpersist(); () }
    Seq.empty
  }
}

/** `MERGE INTO <graft table> t USING <source> s ON <cond> ...` — the
  * SQL-standard action set executed as set operations: one full-outer
  * join computes matched pairs, unmatched source rows, and unmatched
  * target rows; per row the FIRST action whose condition holds
  * applies; the results land as ONE atomic commit
  * ([[FeatureStore.registerRewrite]]): the upsert delta (all UPDATE
  * results + INSERT rows + untouched duplicate-key siblings of touched
  * keys) plus the dropped key set (matched/by-source DELETE actions and
  * originals of rekeying updates).
  */
case class GraftMergeCommand(
    root: String,
    table: String,
    relOutput: Seq[Attribute],
    tableSchema: StructType,
    source: LogicalPlan,
    mergeCondition: Expression,
    matchedActions: Seq[MergeAction],
    notMatchedActions: Seq[MergeAction],
    notMatchedBySourceActions: Seq[MergeAction]) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  private val TP = "_graft_t_"

  override def run(spark: SparkSession): Seq[Row] = {
    val store = new FeatureStore(spark, root)
    val tNames = tableSchema.fieldNames.toSeq
    val names: Map[ExprId, String] =
      relOutput.map(a => a.exprId -> (TP + a.name)).toMap ++
        source.output.zipWithIndex.map { case (a, i) => a.exprId -> s"_graft_s_$i" }
    val plainName = relOutput.map(a => a.exprId -> a.name).toMap
    def remap(e: Expression): Column = GraftDml.remap(e, names)
    def actionCond(a: MergeAction): Column =
      a.condition.map(remap).getOrElse(lit(true))

    // a per-row tag within each key group gives the guard ROW identity:
    // duplicate-key siblings each matched once are a legal merge (each
    // row updates independently), while one row matched by several
    // source rows is the SQL-standard cardinality violation. Ordered by
    // the orderable columns — ties can only be bit-identical rows (or
    // rows differing in non-orderable columns, where the tag is used
    // solely for counting), so the tag never influences row content.
    val keyCols = graft.store.Validation.RequiredColumns
    val orderable = tableSchema.fields.toSeq
      .filter(f => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(f.dataType))
      .map(f => col(TP + f.name))
    val target = store
      .getVersion(table, store.getTableInfo(table).version)
      .select(tNames.map(col): _*)
      .toDF(tNames.map(TP + _): _*)
      .withColumn("_graft_t_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(k => col(TP + k)): _*)
          .orderBy(orderable: _*)))
      .withColumn("_graft_t_present", lit(true))
    val src = bridge.ofRows(spark, source)
      .toDF(source.output.indices.map(i => s"_graft_s_$i"): _*)
      .withColumn("_graft_s_present", lit(true))

    val joined = target.join(src, remap(mergeCondition), "full_outer").persist()
    try {
      val isMatched =
        col("_graft_t_present").isNotNull && col("_graft_s_present").isNotNull
      val tKeys = keyCols.map(k => col(TP + k).as(k))

      // SQL-standard cardinality guard, under ROW identity: a target
      // ROW matched by more than one source row is ambiguous (which
      // update wins?), so fail loudly. Duplicate-key sibling rows each
      // matched once pass — each updates independently, and the delta
      // carries all of the key's resulting rows.
      if (matchedActions.nonEmpty) {
        val matchedPerRow = joined.filter(isMatched)
          .groupBy(keyCols.map(k => col(TP + k)) :+ col("_graft_t_rn"): _*)
          .agg(count(lit(1)).as("_graft_n"))
          .filter(col("_graft_n") > 1)
          .limit(1)
        if (!matchedPerRow.isEmpty)
          throw new FeatureValidationError(
            "MERGE INTO matched one target row more than once (several " +
              "source rows satisfy the ON clause for it); dedupe the " +
              "source first")
      }

      /** First-match-wins action index per row: -1 = no action applies
        * (the row stays untouched).
        */
      def actionTag(actions: Seq[MergeAction]): Column =
        actions.zipWithIndex.foldRight(lit(-1)) {
          case ((a, j), els) => when(actionCond(a), lit(j)).otherwise(els)
        }

      /** Rows of `frame` to which action `i` (first-match-wins) of
        * `actions` applies.
        */
      def applying(frame: DataFrame, actions: Seq[MergeAction], i: Int): DataFrame =
        frame.filter(actionTag(actions) === i)

      def updateRows(frame: DataFrame, actions: Seq[MergeAction]): Seq[DataFrame] =
        actions.zipWithIndex.collect { case (UpdateAction(_, as, _), i) =>
          val assigned = as
            .map(a => GraftDml.assignedField(a, plainName) -> remap(a.value))
            .toMap
          applying(frame, actions, i).select(
            GraftDml.projectRow(tableSchema, assigned, n => col(TP + n)): _*)
        }

      def deleteKeys(frame: DataFrame, actions: Seq[MergeAction]): Seq[DataFrame] =
        actions.zipWithIndex.collect { case (DeleteAction(_), i) =>
          applying(frame, actions, i).select(tKeys: _*)
        }

      // rekeying updates: originals of rows whose key columns change
      def rekeyedOriginals(frame: DataFrame, actions: Seq[MergeAction]): Seq[DataFrame] =
        actions.zipWithIndex.collect {
          case (UpdateAction(_, as, _), i)
              if as.exists(a =>
                keyCols.contains(GraftDml.assignedField(a, plainName))) =>
            applying(frame, actions, i).select(tKeys: _*)
        }

      val matchedFrame = joined.filter(isMatched)
      val insertFrame = joined.filter(
        col("_graft_s_present").isNotNull && col("_graft_t_present").isNull)
      val bySourceFrame = joined.filter(
        col("_graft_t_present").isNotNull && col("_graft_s_present").isNull)

      val insertRows = notMatchedActions.zipWithIndex.collect {
        case (InsertAction(_, as), i) =>
          val assigned = as
            .map(a => GraftDml.assignedField(a, plainName) -> remap(a.value))
            .toMap
          applying(insertFrame, notMatchedActions, i).select(
            GraftDml.projectRow(tableSchema, assigned,
              n => lit(null).cast(tableSchema(n).dataType)): _*)
      }

      val upserts =
        updateRows(matchedFrame, matchedActions) ++
          updateRows(bySourceFrame, notMatchedBySourceActions) ++
          insertRows
      val deletes =
        deleteKeys(matchedFrame, matchedActions) ++
          deleteKeys(bySourceFrame, notMatchedBySourceActions) ++
          rekeyedOriginals(matchedFrame, matchedActions) ++
          rekeyedOriginals(bySourceFrame, notMatchedBySourceActions)

      // Duplicate-key siblings: the store allows duplicate (entity_id,
      // timestamp) observations, and the key-addressed primitives act
      // on WHOLE keys — so every target row NO action touched, at a key
      // the rewrite touches (an unmatched sibling of an updated/deleted
      // row, a pre-existing row at an INSERT's or rekey's target key),
      // rides along in the delta unchanged. Every target row is in
      // exactly one of matchedFrame / bySourceFrame, so tag == -1 over
      // both is the complete untouched set.
      // Dedupe by target-ROW identity before projecting: with no
      // matched action (guard not applicable — multi-match is legal
      // SQL there), a target row matched by k source rows appears k
      // times in matchedFrame; without this it would ride the delta k
      // times and be silently duplicated. The joined copies agree on
      // every _graft_t_ column, so the arbitrary pick is content-safe.
      val untouched = matchedFrame.filter(actionTag(matchedActions) === -1)
        .unionByName(
          bySourceFrame.filter(actionTag(notMatchedBySourceActions) === -1))
        .dropDuplicates(keyCols.map(TP + _) :+ "_graft_t_rn")
        .select(tNames.map(n => col(TP + n).as(n)): _*)
      val upsertDelta = upserts.reduceOption(_ unionByName _)
      val dropKeys = deletes.reduceOption(_ unionByName _)
      val touchedKeys = (upsertDelta.map(_.select(keyCols.map(col): _*)).toSeq ++
        dropKeys.toSeq).reduceOption(_ unionByName _).map(_.distinct())
      val siblings = touchedKeys.map(k =>
        GraftDml.semiJoinKeys(untouched, k, keyCols))

      // one commit whenever the statement has any effect: upsert-only
      // and rewrite (upsert + key drops) are single commits; a pure
      // no-sibling delete takes the key-set delete's segment-drop path
      val delta = (upsertDelta.toSeq ++ siblings.toSeq)
        .reduceOption(_ unionByName _).filterNot(_.isEmpty)
      val drop = dropKeys.filterNot(_.isEmpty)
      (delta, drop) match {
        case (Some(d), Some(k)) => store.registerRewrite(table, d, k); ()
        case (Some(d), None) => store.registerUpsert(table, d); ()
        case (None, Some(k)) => store.deleteRowsByKeys(table, k); ()
        case (None, None) => ()
      }
    } finally { joined.unpersist(); () }
    Seq.empty
  }
}
