package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.store.{FeatureStore, FeatureValidationError}

/** `graft_changes(root, table, from_version, to_version)` — the change
  * data feed as a SQL table-valued function (the Delta `table_changes`
  * shape): every row committed in versions (from, to], with
  * `_change_type` (insert | delete) and `_commit_version`, as a REAL
  * distributed plan — the TVF resolves to
  * [[FeatureStore.getChanges]]'s own logical plan, so the O(changes)
  * fast paths (recorded change sets, appended-segment reads) and the
  * exact-diff fallback all execute exactly as the Scala API would,
  * shuffles included. No driver materialization, unlike a CALL
  * procedure's LocalScan result.
  *
  * {{{
  *   SELECT * FROM graft_changes('/data/features', 'events', 1, 3)
  *   WHERE _change_type = 'delete'
  * }}}
  *
  * Arguments must be literals (the feed is planned at analysis time —
  * the same constraint Delta's `table_changes` has).
  */
object GraftChangesTvf {

  private def strArg(e: Expression, what: String): String = e match {
    case Literal(v: UTF8String, StringType) => v.toString
    case _ => throw new FeatureValidationError(
      s"graft_changes: $what must be a string literal, got $e")
  }

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new FeatureValidationError(
      s"graft_changes: $what must be an integer literal, got $e")
  }

  def descriptor: (
      FunctionIdentifier,
      ExpressionInfo,
      Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_changes"),
    new ExpressionInfo(
      GraftChangesTvf.getClass.getCanonicalName,
      "graft_changes"),
    (args: Seq[Expression]) => {
      if (args.length != 4)
        throw new FeatureValidationError(
          "graft_changes takes (root, table, from_version, to_version), " +
            s"got ${args.length} argument(s)")
      val root = strArg(args(0), "root")
      val table = strArg(args(1), "table")
      val from = intArg(args(2), "from_version")
      val to = intArg(args(3), "to_version")
      val store = new FeatureStore(SparkSession.active, root)
      bridge.analyzed(store.getChanges(table, from, to))
    })
}
