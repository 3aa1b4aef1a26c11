package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

import graft.store.{FeatureStore, FeatureValidationError}

/** Maintenance SQL for graft tables — stored procedures on the
  * catalog (Spark 4's `ProcedureCatalog`, the Iceberg `CALL` shape):
  *
  * {{{
  *   CALL fs.optimize(`table` => 'events', cluster_by => 'timestamp,value', zorder => true)
  *   CALL fs.restore(`table` => 'events', version => 3)
  *   CALL fs.history(`table` => 'events')
  *   CALL fs.vacuum()
  * }}}
  *
  * Each maps 1:1 onto the store's own maintenance operator
  * (`optimizeTable` / `restoreVersion` / `getTableHistory` / `vacuum`)
  * and returns its outcome as result rows, so the whole
  * register→optimize→restore lifecycle is drivable from pure SQL.
  */
private[sources] object GraftProcedures {

  def load(root: String, name: String): UnboundProcedure = name.toLowerCase match {
    case "optimize" => new OptimizeProc(root)
    case "restore" => new RestoreProc(root)
    case "vacuum" => new VacuumProc(root)
    case "history" => new HistoryProc(root)
    case other =>
      throw new FeatureValidationError(
        s"unknown graft procedure '$other' (available: optimize, restore, " +
          "history, vacuum)")
  }

  val names: Seq[String] = Seq("optimize", "restore", "history", "vacuum")

  private def store(root: String) = new FeatureStore(SparkSession.active, root)

  private def param(name: String, t: org.apache.spark.sql.types.DataType) =
    ProcedureParameter.in(name, t).build()

  private def paramD(
      name: String, t: org.apache.spark.sql.types.DataType, default: String) =
    ProcedureParameter.in(name, t).defaultValue(default).build()

  private def resultScan(schema: StructType, rs: Seq[InternalRow]): java.util.Iterator[Scan] =
    java.util.Collections.singletonList[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = rs.toArray
      override def description(): String = "graft procedure result"
    }).iterator()

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** NULL-argument convention, uniform across all procedures:
    * a REQUIRED parameter rejects NULL loudly ([[requireArg]] —
    * `InternalRow`'s primitive getters return 0/false for NULL, so an
    * unguarded `restore(version => NULL)` would silently restore to
    * version 0); a DEFAULTED parameter treats NULL as "take the
    * documented default" ([[boolOrDefault]], vacuum's grace mapping) —
    * explicit NULL and omitted argument behave identically, never as a
    * zero-value misreading.
    */
  private def requireArg(in: InternalRow, i: Int, name: String): Unit =
    if (in.isNullAt(i))
      throw new FeatureValidationError(
        s"procedure argument '$name' must not be NULL")

  private def boolOrDefault(in: InternalRow, i: Int, default: Boolean): Boolean =
    if (in.isNullAt(i)) default else in.getBoolean(i)

  /** OPTIMIZE: cluster (range or Z-ORDER) the current version into a
    * new content-identical one; `incremental => true` rewrites only
    * the unclustered tail.
    */
  private final class OptimizeProc(root: String) extends UnboundProcedure {
    override def name(): String = "optimize"
    override def description(): String =
      "rewrite the table clustered by the given columns (range or Z-order)"
    override def bind(input: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "optimize"
      override def isDeterministic: Boolean = false
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType),
        param("cluster_by", StringType),
        paramD("zorder", BooleanType, "false"),
        paramD("incremental", BooleanType, "false"))
      override def call(in: InternalRow): java.util.Iterator[Scan] = {
        requireArg(in, 0, "table"); requireArg(in, 1, "cluster_by")
        val table = in.getUTF8String(0).toString
        val cols = in.getUTF8String(1).toString.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        val info = store(root).optimizeTable(
          table, cols,
          zorder = boolOrDefault(in, 2, default = false),
          incremental = boolOrDefault(in, 3, default = false))
        resultScan(
          StructType(Seq.empty).add("table", StringType).add("version", IntegerType)
            .add("row_count", LongType),
          Seq(new GenericInternalRow(
            Array[Any](utf8(table), info.version, info.rowCount))))
      }
    }
  }

  /** RESTORE: make version v current again via a zero-copy manifest
    * re-reference (a NEW version — history is never rewritten).
    */
  private final class RestoreProc(root: String) extends UnboundProcedure {
    override def name(): String = "restore"
    override def description(): String =
      "restore the table to a prior version (zero-copy, as a new version)"
    override def bind(input: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "restore"
      override def isDeterministic: Boolean = false
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType),
        param("version", IntegerType))
      override def call(in: InternalRow): java.util.Iterator[Scan] = {
        requireArg(in, 0, "table"); requireArg(in, 1, "version")
        val table = in.getUTF8String(0).toString
        val info = store(root).restoreVersion(table, in.getInt(1))
        resultScan(
          StructType(Seq.empty).add("table", StringType)
            .add("restored_to", IntegerType).add("new_version", IntegerType)
            .add("row_count", LongType),
          Seq(new GenericInternalRow(
            Array[Any](utf8(table), in.getInt(1), info.version, info.rowCount))))
      }
    }
  }

  /** DESCRIBE HISTORY: one row per retained version. */
  private final class HistoryProc(root: String) extends UnboundProcedure {
    override def name(): String = "history"
    override def description(): String =
      "the table's retained version history (version, operation, time, rows)"
    override def bind(input: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "history"
      override def isDeterministic: Boolean = false
      override def parameters(): Array[ProcedureParameter] = Array(
        param("table", StringType))
      override def call(in: InternalRow): java.util.Iterator[Scan] = {
        requireArg(in, 0, "table")
        val table = in.getUTF8String(0).toString
        val hist = store(root).getTableHistory(table)
        resultScan(
          StructType(Seq.empty)
            .add("version", IntegerType).add("operation", StringType)
            .add("committed_at", TimestampType).add("row_count", LongType)
            .add("is_current", BooleanType).add("columns", StringType),
          hist.map(v => new GenericInternalRow(Array[Any](
            v.version,
            v.operation.map(utf8).orNull,
            v.committedAt.map(ms => DateTimeUtils.millisToMicros(ms))
              .map(Long.box).orNull,
            v.rows.map(Long.box).orNull,
            v.isCurrent,
            utf8(v.columns.mkString(","))))))
      }
    }
  }

  /** VACUUM: physically reclaim retired version directories past the
    * grace window (lease-respecting); returns the reclaimed paths.
    */
  private final class VacuumProc(root: String) extends UnboundProcedure {
    override def name(): String = "vacuum"
    override def description(): String =
      "reclaim retired version directories past the grace window"
    override def bind(input: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "vacuum"
      override def isDeterministic: Boolean = false
      override def parameters(): Array[ProcedureParameter] = Array(
        paramD("grace_millis", LongType, "-1"))
      override def call(in: InternalRow): java.util.Iterator[Scan] = {
        // NULL takes the documented default — never zero grace
        val grace = if (in.isNullAt(0)) FeatureStore.DefaultRetireGraceMillis
        else in.getLong(0) match {
          case g if g < 0 => FeatureStore.DefaultRetireGraceMillis
          case g => g
        }
        val reclaimed = store(root).vacuum(graceMillis = grace)
        resultScan(
          StructType(Seq.empty).add("reclaimed_path", StringType),
          reclaimed.map(p => new GenericInternalRow(Array[Any](utf8(p)))))
      }
    }
  }
}
